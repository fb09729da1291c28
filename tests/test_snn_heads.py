"""Unit tests for the SNN heads against step-by-step numpy unrolls."""

import numpy as np
import jax
import jax.numpy as jnp

from snn_automotive_object_detection_tpu.models import heads
from tests import oracles


def _np_conv1x1(x, w):
    # x: [N,H,W,Cin], w: [1,1,Cin,Cout]
    return x @ w[0, 0]


def _np_conv3x3_same(x, w):
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = np.zeros((n, h, wd, cout), x.dtype)
    for dy in range(3):
        for dx in range(3):
            out += xp[:, dy:dy + h, dx:dx + wd] @ w[dy, dx]
    return out


def test_rpn_head_snn_matches_manual_unroll(rng):
    key = jax.random.PRNGKey(3)
    params = heads.init_rpn_head_snn(key, in_channels=8, num_anchors=3)
    feat = rng.uniform(0.0, 4.0, (2, 6, 10, 8)).astype(np.float32)
    t = 5

    logits, bbox, rates = heads.rpn_head_snn_apply(
        params, [jnp.asarray(feat)], t, collect_rates=True,
        compute_dtype=jnp.float32,
    )
    got_obj = np.asarray(logits[0])
    got_bbox = np.asarray(bbox[0])

    # Manual unroll with the numpy norse oracles.
    ws = np.asarray(params["shared_conv"]["w"])
    wc = np.asarray(params["conv_cls"]["w"])
    wb = np.asarray(params["conv_bbox"]["w"])
    zs = oracles.lif_encoder_steps(feat, t)
    currents = [_np_conv3x3_same(z, ws) for z in zs]
    ss = oracles.lif_cell_steps(currents)
    mo = oracles.li_cell_steps([_np_conv1x1(s, wc) for s in ss])
    mb = oracles.li_cell_steps([_np_conv1x1(s, wb) for s in ss])

    np.testing.assert_allclose(got_obj, mo[-1], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_bbox, mb[-1], rtol=1e-4, atol=1e-5)

    want_rate = np.stack(ss).sum(0).mean(axis=(1, 2, 3)) / t
    np.testing.assert_allclose(np.asarray(rates["shared"][0]), want_rate, atol=1e-6)


def test_fastrcnn_snn_matches_manual_unroll(rng):
    key = jax.random.PRNGKey(4)
    params = heads.init_fastrcnn_snn(key, in_channels=32, representation_size=16,
                                     num_classes=4)
    x = rng.uniform(0.0, 4.0, (6, 32)).astype(np.float32)
    t = 8

    cls, reg, rates = heads.fastrcnn_snn_apply(
        params, jnp.asarray(x), t, collect_rates=True, compute_dtype=jnp.float32
    )

    w6 = np.asarray(params["fc6"]["w"])
    w7 = np.asarray(params["fc7"]["w"])
    wc = np.asarray(params["cls_score"]["w"])
    wb = np.asarray(params["bbox_pred"]["w"])

    zs = oracles.lif_encoder_steps(x, t)
    s6 = oracles.lif_cell_steps([z @ w6 for z in zs])
    s7 = oracles.lif_cell_steps([s @ w7 for s in s6])
    mc = oracles.li_cell_steps([s @ wc for s in s7])
    mb = oracles.li_cell_steps([s @ wb for s in s7])

    # atol covers fp32 GEMM reassociation between XLA and numpy; the spike
    # trains themselves match exactly (rates asserted at 1e-6 below).
    np.testing.assert_allclose(np.asarray(cls), mc[-1], rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(reg), mb[-1], rtol=1e-2, atol=1e-3)

    want6 = np.stack(s6).sum(0).mean(axis=1) / t
    # Allow a single-spike discrepancy per RoI: a membrane landing within
    # 1 ulp of v_th can flip under fp32 GEMM reassociation.
    one_spike = 1.0 / (t * 16)
    np.testing.assert_allclose(np.asarray(rates["fc6"]), want6,
                               atol=one_spike + 1e-6)
    assert np.stack(s6).sum() > 0, "test inputs must actually spike"


def test_fastrcnn_snn_gradient_flow():
    """With spiking inputs and enough steps, grads reach fc6/fc7."""
    key = jax.random.PRNGKey(5)
    params = heads.init_fastrcnn_snn(key, in_channels=32, representation_size=16,
                                     num_classes=4)
    x = jnp.full((6, 32), 2.0)

    def loss(p):
        cls, reg, _ = heads.fastrcnn_snn_apply(p, x, 8, compute_dtype=jnp.float32)
        return (cls ** 2).sum() + (reg ** 2).sum()

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["fc6"]["w"]).sum()) > 0
    assert float(jnp.abs(g["fc7"]["w"]).sum()) > 0


def test_only_one_bbox_output_shape():
    params = heads.init_fastrcnn_snn(jax.random.PRNGKey(0), 32, 16, 4,
                                     only_one_bbox=True)
    cls, reg, _ = heads.fastrcnn_snn_apply(params, jnp.ones((3, 32)), 4,
                                           compute_dtype=jnp.float32)
    assert cls.shape == (3, 4)
    assert reg.shape == (3, 4)


def test_fastrcnn_snn_precompute_fc6_exact(rng):
    """The stacked-T fc6 GEMM path (inference schedule) must reproduce the
    fast-encoder step path bit-for-bit in f32: identical spike trains and
    identical per-step arithmetic, only the GEMM batching differs."""
    params = heads.init_fastrcnn_snn(jax.random.PRNGKey(7), 128, 32, 5)
    x = jnp.asarray(rng.uniform(0, 2.5, (17, 128)).astype(np.float32))
    a = heads.fastrcnn_snn_apply(params, x, 12, collect_rates=True,
                                 compute_dtype=jnp.float32, fast_encoder=True)
    b = heads.fastrcnn_snn_apply(params, x, 12, collect_rates=True,
                                 compute_dtype=jnp.float32,
                                 precompute_fc6=True)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]),
                               atol=1e-6, rtol=1e-6)
    for k in a[2]:
        np.testing.assert_allclose(np.asarray(a[2][k]), np.asarray(b[2][k]),
                                   atol=1e-6)
