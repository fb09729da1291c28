"""Fused Pallas FPN kernel vs the XLA path (interpret mode on CPU).

The kernel (ops/pallas_fpn.py) reproduces the lateral + top-down merge +
outer-3x3 chain of models/resnet_fpn.py:239-257 with the same bf16 rounding
sequence; differences are limited to matmul reduction order (bf16 1-ulp
class), so tolerances are tight at f32-accumulated bf16 scale.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from snn_automotive_object_detection_tpu.models.resnet_fpn import (
    _conv,
    _upsample_nearest_2x,
)
from snn_automotive_object_detection_tpu.ops.pallas_fpn import (
    fpn_level_pallas,
    fpn_pallas_apply,
)


def _mk_fpn_params(key, cins=(256, 512, 1024, 2048)):
    ks = jax.random.split(key, 16)
    inner, layer = [], []
    for i, cin in enumerate(cins):
        inner.append({
            "w": jax.random.normal(ks[4 * i], (1, 1, cin, 256)) * 0.02,
            "b": jax.random.normal(ks[4 * i + 1], (256,)) * 0.02,
        })
        layer.append({
            "w": jax.random.normal(ks[4 * i + 2], (3, 3, 256, 256)) * 0.02,
            "b": jax.random.normal(ks[4 * i + 3], (256,)) * 0.02,
        })
    return {"inner": inner, "layer": layer}


def _xla_fpn(cs, fpn, dtype=jnp.bfloat16):
    # Mirror of resnet_fpn.resnet50_fpn_apply_from_p1's FPN tail.
    def inner(i, t):
        return _conv(t, fpn["inner"][i]["w"]) + fpn["inner"][i]["b"].astype(t.dtype)

    def outer(i, t):
        return _conv(t, fpn["layer"][i]["w"]) + fpn["layer"][i]["b"].astype(t.dtype)

    cs = [c.astype(dtype) for c in cs]
    lat = [inner(i, c) for i, c in enumerate(cs)]
    p5 = lat[3]
    p4 = lat[2] + _upsample_nearest_2x(p5, lat[2].shape[1:3])
    p3 = lat[1] + _upsample_nearest_2x(p4, lat[1].shape[1:3])
    p2 = lat[0] + _upsample_nearest_2x(p3, lat[0].shape[1:3])
    outs = [outer(0, p2), outer(1, p3), outer(2, p4), outer(3, p5)]
    outs.append(outs[3][:, ::2, ::2, :])
    return outs


def _cs(rng, shapes, cins, n=2):
    return [
        jnp.asarray(rng.uniform(-1, 1, (n, h, w, c)).astype(np.float32))
        for (h, w), c in zip(shapes, cins)
    ]


def test_fpn_level_matches_xla_top_level(rng):
    fpn = _mk_fpn_params(jax.random.PRNGKey(0))
    c5 = _cs(rng, [(6, 12)], [2048])[0].astype(jnp.bfloat16)
    p5_k, m5 = fpn_level_pallas(
        c5, None, fpn["inner"][3]["w"], fpn["inner"][3]["b"],
        fpn["layer"][3]["w"], fpn["layer"][3]["b"], store_merged=True,
        interpret=True,
    )
    lat = _conv(c5, fpn["inner"][3]["w"]) + fpn["inner"][3]["b"].astype(jnp.bfloat16)
    want = _conv(lat, fpn["layer"][3]["w"]) + fpn["layer"][3]["b"].astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(m5, np.float32), np.asarray(lat, np.float32),
        atol=2e-2, rtol=2e-2,
    )
    np.testing.assert_allclose(
        np.asarray(p5_k, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2,
    )


@pytest.mark.parametrize("shapes", [
    [(24, 48), (12, 24), (6, 12), (3, 6)],     # exact 2x pyramid
    [(25, 50), (13, 25), (7, 13), (4, 7)],     # odd sizes (ceil halving)
])
def test_fpn_full_matches_xla(rng, shapes):
    cins = (256, 512, 1024, 2048)
    fpn = _mk_fpn_params(jax.random.PRNGKey(1), cins)
    cs = _cs(rng, shapes, cins)

    want = _xla_fpn(cs, fpn)
    got = fpn_pallas_apply([c.astype(jnp.bfloat16) for c in cs], fpn)
    assert len(got) == 5
    for l in range(5):
        assert got[l].shape == want[l].shape, l
        np.testing.assert_allclose(
            np.asarray(got[l], np.float32), np.asarray(want[l], np.float32),
            atol=3e-2, rtol=3e-2, err_msg=f"level {l}",
        )
