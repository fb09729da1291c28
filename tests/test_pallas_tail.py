"""Fused Pallas box-head tail kernel vs the XLA tail scan (interpret mode
on CPU). Production gate: detector.make_head_applies (TPU + bf16 compute +
f32 states). The kernel must be BIT-identical to
heads._fastrcnn_snn_from_cur6 at those numerics."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from snn_automotive_object_detection_tpu.models import heads
from snn_automotive_object_detection_tpu.snn.pallas_tail import (
    box_tail_pallas,
    tail_supported,
)


@pytest.fixture(scope="module")
def small_head():
    # rep must be lane-aligned (production head rep=1024); 6 classes.
    return heads.init_fastrcnn_snn(jax.random.PRNGKey(3), 512, 128, 6)


@pytest.mark.parametrize("collect_rates", [False, True])
def test_tail_matches_xla_scan(rng, small_head, collect_rates):
    t, r, rep = 5, 200, 128  # r not a multiple of 128 -> exercises padding
    w7 = small_head["fc7"]["w"]
    wc = small_head["cls_score"]["w"]
    wb = small_head["bbox_pred"]["w"]
    # Realistic current scale: fc6 outputs land around the LIF threshold.
    cur6 = jnp.asarray(
        rng.normal(0.0, 0.15, (t, r, rep)).astype(np.float32)
    ).astype(jnp.bfloat16)

    want_c, want_b, want_rates = heads._fastrcnn_snn_from_cur6(
        cur6, w7, wc, wb, t, collect_rates, jnp.bfloat16,
        enc_counts=jnp.zeros((r,)), d_in=1, state_dtype=jnp.float32,
    )
    got_c, got_b, c6, c7 = box_tail_pallas(
        cur6, w7, wc, wb, t, collect_rates=collect_rates, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got_c), np.asarray(want_c))
    np.testing.assert_array_equal(np.asarray(got_b), np.asarray(want_b))
    if collect_rates:
        np.testing.assert_array_equal(
            np.asarray(c6), np.asarray(want_rates["fc6"] * (t * rep)))
        np.testing.assert_array_equal(
            np.asarray(c7), np.asarray(want_rates["fc7"] * (t * rep)))


@pytest.mark.parametrize("collect_rates", [False, True])
def test_full_head_kernel_tail_vs_xla_tail(rng, small_head, collect_rates):
    """fastrcnn_snn_apply: pallas_fc6 + pallas_tail == pallas_fc6 + XLA
    tail, bit-exact (both consume the identical fc6-kernel currents)."""
    t, r = 8, 96
    x = jnp.asarray(rng.uniform(0, 2.5, (r, 512)).astype(np.float32))
    kw = dict(
        num_steps=t, collect_rates=collect_rates,
        compute_dtype=jnp.bfloat16, pallas_fc6=True,
        state_dtype=jnp.float32,
    )
    cls_w, reg_w, rates_w = heads.fastrcnn_snn_apply(
        small_head, x, pallas_tail=False, **kw)
    cls_p, reg_p, rates_p = heads.fastrcnn_snn_apply(
        small_head, x, pallas_tail=True, **kw)
    np.testing.assert_array_equal(np.asarray(cls_p), np.asarray(cls_w))
    np.testing.assert_array_equal(np.asarray(reg_p), np.asarray(reg_w))
    if collect_rates:
        for k in rates_w:
            np.testing.assert_allclose(
                np.asarray(rates_p[k]), np.asarray(rates_w[k]), atol=1e-7)
    else:
        assert rates_w is None and rates_p is None


def test_tail_gate_falls_back_on_bf16_states(rng, small_head):
    """pallas_tail with bf16 states must take the XLA tail (the kernel is
    f32-state only) — outputs identical to pallas_tail=False."""
    t, r = 4, 64
    x = jnp.asarray(rng.uniform(0, 2.5, (r, 512)).astype(np.float32))
    kw = dict(num_steps=t, compute_dtype=jnp.bfloat16, pallas_fc6=True,
              state_dtype=None)
    a = heads.fastrcnn_snn_apply(small_head, x, pallas_tail=True, **kw)
    b = heads.fastrcnn_snn_apply(small_head, x, pallas_tail=False, **kw)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_tail_supported_gates():
    assert tail_supported(1024, 9, 36, 12)
    assert not tail_supported(1000, 9, 36, 12)   # rep not lane-aligned
    assert not tail_supported(1024, 200, 36, 12)  # cls wider than one lane
    assert not tail_supported(1024, 9, 300, 12)   # reg wider than one lane
