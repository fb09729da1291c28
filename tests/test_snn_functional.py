import numpy as np
import jax
import jax.numpy as jnp

from snn_automotive_object_detection_tpu.snn import functional as F
from tests import oracles


def test_encoder_matches_oracle(rng):
    x = rng.uniform(0, 3, (5, 7)).astype(np.float32)
    want = oracles.lif_encoder_steps(x, 8)
    v = jnp.zeros_like(jnp.asarray(x))
    for t in range(8):
        z, v = F.lif_current_encoder(jnp.asarray(x), v)
        np.testing.assert_allclose(np.asarray(z), want[t], atol=1e-6)


def test_encoder_constant_current_spike_timing():
    # With constant current I and tau_mem_inv*dt = 0.1:
    # v_k = I * (1 - 0.9^k); first spike when v_k > 0.25.
    x = jnp.asarray([[0.5]])
    v = jnp.zeros_like(x)
    spikes = []
    for _ in range(12):
        z, v = F.lif_current_encoder(x, v)
        spikes.append(float(z[0, 0]))
    # v_k = 0.5*(1-0.9^k): k=1 -> .05, ... first crossing of .25:
    # 1-0.9^k > 0.5 -> k >= 7 (0.9^7=0.478)
    assert spikes[:6] == [0.0] * 6
    assert spikes[6] == 1.0


def test_lif_cell_matches_oracle(rng):
    currents = [rng.normal(0, 0.5, (4, 6)).astype(np.float32) for _ in range(10)]
    want = oracles.lif_cell_steps(currents)
    state = F.zeros_lif_state((4, 6))
    for t in range(10):
        z, state = F.lif_feed_forward_step(jnp.asarray(currents[t]), state)
        np.testing.assert_allclose(np.asarray(z), want[t], atol=1e-6)


def test_lif_cell_one_step_latency():
    # Input current only reaches the membrane on the NEXT step.
    x = jnp.full((1,), 100.0)
    state = F.zeros_lif_state((1,))
    z1, state = F.lif_feed_forward_step(x, state)
    assert float(z1[0]) == 0.0  # v was 0, i was 0 -> no spike yet
    z2, state = F.lif_feed_forward_step(jnp.zeros(1), state)
    assert float(z2[0]) == 1.0  # i=100 decays v across threshold


def test_li_cell_matches_oracle(rng):
    currents = [rng.normal(0, 1.0, (3, 5)).astype(np.float32) for _ in range(12)]
    want = oracles.li_cell_steps(currents)
    state = F.zeros_li_state((3, 5))
    for t in range(12):
        v, state = F.li_feed_forward_step(jnp.asarray(currents[t]), state)
        np.testing.assert_allclose(np.asarray(v), want[t], rtol=1e-5, atol=1e-6)


def test_superspike_gradient():
    def f(x):
        return F.heaviside_super(x, 100.0).sum()

    g = jax.grad(f)(jnp.asarray([0.0, 0.01, -0.01, 1.0]))
    want = 1.0 / (100.0 * np.abs([0.0, 0.01, -0.01, 1.0]) + 1.0) ** 2
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-6)


def test_gradient_flows_through_scan():
    """Training viability: loss gradients must be nonzero through T steps."""
    w = jnp.asarray(0.7)

    def loss(w):
        x = jnp.full((8,), 0.6) * w
        v = jnp.zeros(8)
        state = F.zeros_lif_state((8,))
        li = F.zeros_li_state((8,))
        out = None
        for _ in range(6):
            z, v = F.lif_current_encoder(x, v)
            s, state = F.lif_feed_forward_step(z * 3.0, state)
            out, li = F.li_feed_forward_step(s, li)
        return out.sum()

    g = jax.grad(loss)(w)
    assert np.isfinite(float(g))
    assert float(g) != 0.0


def test_closed_form_encoder_matches_iterative(rng):
    """encoder_periods/encoder_spikes_at == step-by-step integration."""
    x = np.concatenate([
        rng.uniform(-1, 5, 4000),
        np.array([0.0, 0.25, 0.2500001, 0.26, 100.0, -3.0]),
    ]).astype(np.float32)
    t_max = 16
    want = np.stack(oracles.lif_encoder_steps(x, t_max))  # [T, N]
    periods = F.encoder_periods(jnp.asarray(x))
    got = np.stack([
        np.asarray(F.encoder_spikes_at(periods, jnp.asarray(t)))
        for t in range(t_max)
    ])
    mismatch = (got != want).mean()
    assert mismatch < 1e-3, mismatch  # only fp-boundary elements may differ
    # The canonical operating currents must match exactly.
    exact = np.array([0.5, 1.0, 2.0, 3.3], np.float32)
    wp = np.stack(oracles.lif_encoder_steps(exact, t_max))
    gp = np.stack([
        np.asarray(F.encoder_spikes_at(F.encoder_periods(jnp.asarray(exact)),
                                       jnp.asarray(t))) for t in range(t_max)
    ])
    np.testing.assert_array_equal(gp, wp)
