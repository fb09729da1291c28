"""Fused Pallas RPN-head kernel vs the XLA scan path (interpret mode on CPU).

The kernel (snn/pallas_rpn.py) must reproduce heads.rpn_head_snn_apply with
fast_encoder=True: identical encoder spike trains (both derive from the
closed-form period map) and the same LIF/LI update ordering. In f32 the only
differences are matmul reduction order, so membranes match tightly; in bf16,
borderline membranes can flip a spike, so tolerances are spike-scale.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from snn_automotive_object_detection_tpu.models import heads
from snn_automotive_object_detection_tpu.snn.pallas_rpn import (
    rpn_head_snn_pallas_apply,
    rpn_head_snn_pallas_train_apply,
)


def _feats(rng, shapes, c=256, n=2):
    return [
        jnp.asarray(rng.uniform(0, 2.0, (n, h, w, c)).astype(np.float32))
        for (h, w) in shapes
    ]


def test_pallas_rpn_matches_xla_f32(rng):
    params = heads.init_rpn_head_snn(jax.random.PRNGKey(0), 256, 3)
    # Odd sizes: H=10 not a multiple of the row tile, W=18 forces column
    # padding; second level is tiny (tile cap at padded image height).
    feats = _feats(rng, [(10, 18), (5, 9)])

    o_ref, b_ref, _ = heads.rpn_head_snn_apply(
        params, feats, 8, compute_dtype=jnp.float32, fast_encoder=True
    )
    o_k, b_k, rates = rpn_head_snn_pallas_apply(
        params, feats, 8, state_dtype=jnp.float32, interpret=True
    )
    assert rates is None
    for l in range(len(feats)):
        assert o_k[l].shape == o_ref[l].shape
        assert b_k[l].shape == b_ref[l].shape
        np.testing.assert_allclose(
            np.asarray(o_k[l]), np.asarray(o_ref[l]), atol=1e-5, rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(b_k[l]), np.asarray(b_ref[l]), atol=1e-5, rtol=1e-5
        )


def test_pallas_rpn_bf16_close_to_xla_bf16(rng):
    params = heads.init_rpn_head_snn(jax.random.PRNGKey(1), 256, 3)
    feats = _feats(rng, [(8, 16)])

    o_ref, b_ref, _ = heads.rpn_head_snn_apply(
        params, feats, 8, compute_dtype=jnp.bfloat16, fast_encoder=True
    )
    o_k, b_k, _ = rpn_head_snn_pallas_apply(
        params, feats, 8, state_dtype=jnp.bfloat16, interpret=True
    )
    # bf16 rounding-order differences can flip borderline spikes; membranes
    # agree to spike scale (logit scale here is ~5e-2 with init weights).
    np.testing.assert_allclose(
        np.asarray(o_k[0]), np.asarray(o_ref[0]), atol=0.05
    )
    np.testing.assert_allclose(
        np.asarray(b_k[0]), np.asarray(b_ref[0]), atol=0.05
    )


def test_pallas_rpn_bf16_close_to_default_xla_path(rng):
    """Kernel vs the PRODUCTION XLA/CPU fallback (fast_encoder=False).

    The fallback simulates the encoder membrane step-by-step in bf16, while
    the kernel uses f32 closed-form periods — a distinct difference class
    from matmul reduction order (ADVICE r2): borderline bf16 membranes can
    spike a step early/late vs the exact period. Tolerance is spike-scale.
    """
    params = heads.init_rpn_head_snn(jax.random.PRNGKey(3), 256, 3)
    feats = _feats(rng, [(8, 16)])

    o_ref, b_ref, _ = heads.rpn_head_snn_apply(
        params, feats, 8, compute_dtype=jnp.bfloat16, fast_encoder=False
    )
    o_k, b_k, _ = rpn_head_snn_pallas_apply(
        params, feats, 8, state_dtype=jnp.bfloat16, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(o_k[0]), np.asarray(o_ref[0]), atol=0.05
    )
    np.testing.assert_allclose(
        np.asarray(b_k[0]), np.asarray(b_ref[0]), atol=0.05
    )


def test_pallas_rpn_mobilenet_anchor_count(rng):
    # 15 anchors/location (5 sizes x 3 ratios) -> 75 output channels, still
    # within the kernel's 128-lane readout.
    params = heads.init_rpn_head_snn(jax.random.PRNGKey(2), 256, 15)
    feats = _feats(rng, [(6, 10)])
    o_ref, b_ref, _ = heads.rpn_head_snn_apply(
        params, feats, 4, compute_dtype=jnp.float32, fast_encoder=True
    )
    o_k, b_k, _ = rpn_head_snn_pallas_apply(
        params, feats, 4, state_dtype=jnp.float32, interpret=True
    )
    assert o_k[0].shape == (2, 6, 10, 15) and b_k[0].shape == (2, 6, 10, 60)
    np.testing.assert_allclose(
        np.asarray(o_k[0]), np.asarray(o_ref[0]), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(b_k[0]), np.asarray(b_ref[0]), atol=1e-5, rtol=1e-5
    )


def test_pallas_rpn_train_gradient_parity_f32(rng):
    """Custom-VJP backward kernel vs autodiff through the XLA scan (f32).

    Weight gradients must match: the encoder carries no parameters and the
    features are frozen, so dL/d{shared_conv, conv_cls, conv_bbox} is the
    complete gradient surface (reference trains exactly these,
    train.py:149-200 with the backbone under no_grad).
    """
    params = heads.init_rpn_head_snn(jax.random.PRNGKey(4), 256, 3)
    feats = _feats(rng, [(10, 18), (5, 9)], n=1)
    ro = [jnp.asarray(rng.normal(size=(1, h, w, 3)).astype(np.float32))
          for (h, w) in [(10, 18), (5, 9)]]
    rb = [jnp.asarray(rng.normal(size=(1, h, w, 12)).astype(np.float32))
          for (h, w) in [(10, 18), (5, 9)]]

    def loss_xla(p):
        o, b, _ = heads.rpn_head_snn_apply(
            p, feats, 6, compute_dtype=jnp.float32, fast_encoder=True
        )
        return sum((oo * r).sum() for oo, r in zip(o, ro)) + \
            sum((bb * r).sum() for bb, r in zip(b, rb))

    def loss_pallas(p):
        o, b, _ = rpn_head_snn_pallas_train_apply(
            p, feats, 6, state_dtype=jnp.float32, interpret=True
        )
        return sum((oo * r).sum() for oo, r in zip(o, ro)) + \
            sum((bb * r).sum() for bb, r in zip(b, rb))

    g_ref = jax.grad(loss_xla)(params)
    g_k = jax.grad(loss_pallas)(params)
    for name in ("shared_conv", "conv_cls", "conv_bbox"):
        a = np.asarray(g_ref[name]["w"])
        k = np.asarray(g_k[name]["w"])
        assert a.shape == k.shape
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(k / scale, a / scale, atol=2e-5,
                                   err_msg=name)


def test_pallas_rpn_train_forward_matches_inference_kernel(rng):
    params = heads.init_rpn_head_snn(jax.random.PRNGKey(5), 256, 3)
    feats = _feats(rng, [(6, 10)], n=1)
    o_t, b_t, _ = rpn_head_snn_pallas_train_apply(
        params, feats, 4, state_dtype=jnp.float32, interpret=True
    )
    o_i, b_i, _ = rpn_head_snn_pallas_apply(
        params, feats, 4, state_dtype=jnp.float32, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(o_t[0]), np.asarray(o_i[0]))
    np.testing.assert_array_equal(np.asarray(b_t[0]), np.asarray(b_i[0]))


def test_pallas_rpn_in_kernel_rates_match_xla(rng):
    """In-kernel spike-rate accumulators equal the XLA path's rates.

    f32 + fast_encoder gives identical spike trains, so the counts must
    match to float-sum tolerance (VERDICT r2 Missing #3 / SURVEY §2.2).
    """
    params = heads.init_rpn_head_snn(jax.random.PRNGKey(6), 256, 3)
    feats = _feats(rng, [(10, 18), (5, 9)])

    o_ref, b_ref, r_ref = heads.rpn_head_snn_apply(
        params, feats, 8, compute_dtype=jnp.float32, fast_encoder=True,
        collect_rates=True,
    )
    o_k, b_k, r_k = rpn_head_snn_pallas_apply(
        params, feats, 8, state_dtype=jnp.float32, interpret=True,
        collect_rates=True,
    )
    assert r_k is not None and set(r_k) == {"encoder", "shared"}
    for key in ("encoder", "shared"):
        got, want = np.asarray(r_k[key]), np.asarray(r_ref[key])
        assert got.shape == want.shape == (2, 2)
        np.testing.assert_allclose(got, want, atol=1e-6, err_msg=key)
    assert np.asarray(r_k["encoder"]).max() > 0.01
    # outputs unchanged by the rates variant
    np.testing.assert_allclose(np.asarray(o_k[0]), np.asarray(o_ref[0]),
                               atol=1e-5, rtol=1e-5)


def test_pallas_rpn_mixed_lif_state(rng):
    """AMP-style mixed mode (lif_state_dtype=f32, state_dtype=bf16): the
    kernel must track the XLA mixed path (compute bf16 + state f32) at
    spike scale, and must sit CLOSER to the full-f32 reference than the
    all-bf16 kernel does."""
    params = heads.init_rpn_head_snn(jax.random.PRNGKey(5), 256, 3)
    feats = _feats(rng, [(8, 16)])
    t = 8

    o_mix, b_mix, _ = rpn_head_snn_pallas_apply(
        params, feats, t, state_dtype=jnp.bfloat16,
        lif_state_dtype=jnp.float32, interpret=True
    )
    o_xla, _, _ = heads.rpn_head_snn_apply(
        params, feats, t, compute_dtype=jnp.bfloat16,
        state_dtype=jnp.float32, fast_encoder=True
    )
    np.testing.assert_allclose(
        np.asarray(o_mix[0]), np.asarray(o_xla[0]), atol=0.05
    )

    o_f32, _, _ = heads.rpn_head_snn_apply(
        params, feats, t, compute_dtype=jnp.float32, fast_encoder=True
    )
    o_bf, _, _ = rpn_head_snn_pallas_apply(
        params, feats, t, state_dtype=jnp.bfloat16, interpret=True
    )
    err_mix = float(jnp.abs(o_mix[0] - o_f32[0]).mean())
    err_bf = float(jnp.abs(o_bf[0] - o_f32[0]).mean())
    assert err_mix < err_bf
    # default (lif_state_dtype=None) stays bit-identical to the bf16 kernel
    o_def, b_def, _ = rpn_head_snn_pallas_apply(
        params, feats, t, state_dtype=jnp.bfloat16,
        lif_state_dtype=jnp.bfloat16, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(o_def[0]), np.asarray(o_bf[0]))


def test_pallas_rpn_pipelined_bit_identical(rng, monkeypatch):
    """The software-pipelined step loop (RPN_PIPELINE=1 / pipelined=True)
    is a scheduling-only change: outputs and spike-rate accumulators must
    be bit-identical to the serial fori_loop kernel in every dtype mode."""
    from snn_automotive_object_detection_tpu.snn import pallas_rpn as pr

    params = heads.init_rpn_head_snn(jax.random.PRNGKey(7), 256, 3)
    feats = _feats(rng, [(10, 18), (5, 9)])
    for state_dtype, lif_dtype in [
        (jnp.bfloat16, None),
        (jnp.bfloat16, jnp.float32),
        (jnp.float32, None),
    ]:
        # Force the serial loop for the baseline: the import-time default
        # is pipelined=True now, so without this the first combo would
        # compare pipelined-vs-pipelined (ADVICE r4).
        monkeypatch.setattr(pr, "_PIPELINE_DEFAULT", False)
        o_s, b_s, r_s = rpn_head_snn_pallas_apply(
            params, feats, 8, state_dtype=state_dtype, interpret=True,
            collect_rates=True, lif_state_dtype=lif_dtype,
        )
        monkeypatch.setattr(pr, "_PIPELINE_DEFAULT", True)
        o_p, b_p, r_p = rpn_head_snn_pallas_apply(
            params, feats, 8, state_dtype=state_dtype, interpret=True,
            collect_rates=True, lif_state_dtype=lif_dtype,
        )
        monkeypatch.setattr(pr, "_PIPELINE_DEFAULT", False)
        for lvl in range(len(feats)):
            np.testing.assert_array_equal(np.asarray(o_s[lvl], np.float32),
                                          np.asarray(o_p[lvl], np.float32))
            np.testing.assert_array_equal(np.asarray(b_s[lvl], np.float32),
                                          np.asarray(b_p[lvl], np.float32))
        for key in ("encoder", "shared"):
            np.testing.assert_allclose(np.asarray(r_s[key]),
                                       np.asarray(r_p[key]), rtol=1e-6)


def test_pallas_rpn_x2_bit_identical(rng, monkeypatch):
    """The cross-image-paired kernel (RPN_X2 experiment, VERDICT r4 #4b)
    interleaves two images' independent step chains — a scheduling-only
    change whose outputs must be bit-identical to the per-image kernel in
    every dtype mode, including batch 4 (two pairs) and odd heights."""
    from snn_automotive_object_detection_tpu.snn import pallas_rpn as pr

    params = heads.init_rpn_head_snn(jax.random.PRNGKey(11), 256, 3)
    for n in (2, 4):
        feats = _feats(rng, [(10, 18), (5, 9)], n=n)
        for state_dtype, lif_dtype in [
            (jnp.bfloat16, None),
            (jnp.bfloat16, jnp.float32),
            (jnp.float32, None),
        ]:
            monkeypatch.setattr(pr, "_X2_DEFAULT", False)
            o_s, b_s, _ = rpn_head_snn_pallas_apply(
                params, feats, 8, state_dtype=state_dtype, interpret=True,
                lif_state_dtype=lif_dtype,
            )
            monkeypatch.setattr(pr, "_X2_DEFAULT", True)
            o_p, b_p, _ = rpn_head_snn_pallas_apply(
                params, feats, 8, state_dtype=state_dtype, interpret=True,
                lif_state_dtype=lif_dtype,
            )
            monkeypatch.setattr(pr, "_X2_DEFAULT", False)
            for lvl in range(len(feats)):
                np.testing.assert_array_equal(
                    np.asarray(o_s[lvl], np.float32),
                    np.asarray(o_p[lvl], np.float32))
                np.testing.assert_array_equal(
                    np.asarray(b_s[lvl], np.float32),
                    np.asarray(b_p[lvl], np.float32))


def test_pallas_rpn_xla_periods_bit_identical(rng, monkeypatch):
    """RPN_XLA_PERIODS moves the pointwise encoder-period pass out of the
    kernel (XLA computes the period plane; the kernel DMAs periods instead
    of features). Same f32 compare chain on the same state-dtype-rounded
    inputs -> outputs must be bit-identical in every dtype mode, including
    rate collection (the encoder z counts come from the same countdown)."""
    from snn_automotive_object_detection_tpu.snn import pallas_rpn as pr

    params = heads.init_rpn_head_snn(jax.random.PRNGKey(13), 256, 3)
    feats = _feats(rng, [(10, 18), (5, 9)], n=2)
    for state_dtype, lif_dtype in [
        (jnp.bfloat16, None),
        (jnp.bfloat16, jnp.float32),
        (jnp.float32, None),
    ]:
        for collect in (False, True):
            monkeypatch.setattr(pr, "_XLA_PERIODS_DEFAULT", False)
            r_s = rpn_head_snn_pallas_apply(
                params, feats, 8, state_dtype=state_dtype, interpret=True,
                lif_state_dtype=lif_dtype, collect_rates=collect,
            )
            monkeypatch.setattr(pr, "_XLA_PERIODS_DEFAULT", True)
            r_p = rpn_head_snn_pallas_apply(
                params, feats, 8, state_dtype=state_dtype, interpret=True,
                lif_state_dtype=lif_dtype, collect_rates=collect,
            )
            monkeypatch.setattr(pr, "_XLA_PERIODS_DEFAULT", False)
            for lvl in range(len(feats)):
                np.testing.assert_array_equal(
                    np.asarray(r_s[0][lvl], np.float32),
                    np.asarray(r_p[0][lvl], np.float32))
                np.testing.assert_array_equal(
                    np.asarray(r_s[1][lvl], np.float32),
                    np.asarray(r_p[1][lvl], np.float32))
            if collect:
                for key in ("encoder", "shared"):
                    np.testing.assert_allclose(np.asarray(r_s[2][key]),
                                               np.asarray(r_p[2][key]),
                                               rtol=1e-6)


def test_pallas_rpn_train_gradient_parity_mixed(rng):
    """AMP-style mixed VJP (bf16 matmul operands + f32 LIF states) vs
    autodiff through the XLA mixed scan (VERDICT r4 #2): with identical
    spike trains (closed-form encoder, f32 states) the weight gradients
    must agree to bf16 matmul rounding."""
    params = heads.init_rpn_head_snn(jax.random.PRNGKey(4), 256, 3)
    feats = _feats(rng, [(10, 18), (5, 9)], n=1)
    ro = [jnp.asarray(rng.normal(size=(1, h, w, 3)).astype(np.float32))
          for (h, w) in [(10, 18), (5, 9)]]
    rb = [jnp.asarray(rng.normal(size=(1, h, w, 12)).astype(np.float32))
          for (h, w) in [(10, 18), (5, 9)]]

    def loss_xla(p):
        o, b, _ = heads.rpn_head_snn_apply(
            p, feats, 6, compute_dtype=jnp.bfloat16,
            state_dtype=jnp.float32, fast_encoder=True
        )
        return sum((oo.astype(jnp.float32) * r).sum()
                   for oo, r in zip(o, ro)) + \
            sum((bb.astype(jnp.float32) * r).sum()
                for bb, r in zip(b, rb))

    def loss_pallas(p):
        o, b, _ = rpn_head_snn_pallas_train_apply(
            p, feats, 6, state_dtype=jnp.bfloat16,
            lif_state_dtype=jnp.float32, interpret=True
        )
        return sum((oo.astype(jnp.float32) * r).sum()
                   for oo, r in zip(o, ro)) + \
            sum((bb.astype(jnp.float32) * r).sum()
                for bb, r in zip(b, rb))

    g_ref = jax.grad(loss_xla)(params)
    g_k = jax.grad(loss_pallas)(params)
    for name in ("shared_conv", "conv_cls", "conv_bbox"):
        a = np.asarray(g_ref[name]["w"], np.float32)
        k = np.asarray(g_k[name]["w"], np.float32)
        assert a.shape == k.shape
        scale = np.abs(a).max() + 1e-12
        # bf16 conv reduction-order differences flip borderline LIF spikes
        # (~0.5% of elements, measured), which the surrogate magnifies.
        # The two paths round identically-VALUED but differently-ORDERED
        # matmuls, so the residual is unbiased flip noise: bound the
        # outlier fraction, the mean residual, and the correlation instead
        # of a hard per-element atol.
        d = np.abs(k - a) / scale
        assert (d > 6e-2).mean() < 0.01, (name, float((d > 6e-2).mean()))
        assert d.max() < 0.3, (name, float(d.max()))
        assert float(d.mean()) < 2e-3, (name, float(d.mean()))
        corr = float((a * k).sum() /
                     (np.linalg.norm(a) * np.linalg.norm(k) + 1e-12))
        assert corr > 0.999, (name, corr)


def test_pallas_rpn_train_mixed_forward_matches_inference_kernel(rng):
    """Mixed-mode train forward must be bit-identical to the mixed-mode
    inference kernel (same _run_level, same lif_dtype)."""
    params = heads.init_rpn_head_snn(jax.random.PRNGKey(5), 256, 3)
    feats = _feats(rng, [(6, 10)], n=1)
    o_t, b_t, _ = rpn_head_snn_pallas_train_apply(
        params, feats, 4, state_dtype=jnp.bfloat16,
        lif_state_dtype=jnp.float32, interpret=True
    )
    o_i, b_i, _ = rpn_head_snn_pallas_apply(
        params, feats, 4, state_dtype=jnp.bfloat16,
        lif_state_dtype=jnp.float32, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(o_t[0]), np.asarray(o_i[0]))
    np.testing.assert_array_equal(np.asarray(b_t[0]), np.asarray(b_i[0]))
