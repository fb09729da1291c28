"""Pallas fused FC-head kernel vs the XLA scan path (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from snn_automotive_object_detection_tpu.models import heads


@pytest.mark.parametrize("t", [4, 12])
def test_pallas_head_matches_xla(rng, t):
    from jax.experimental.pallas import tpu as pltpu

    from snn_automotive_object_detection_tpu.snn.pallas_kernels import (
        fastrcnn_snn_pallas,
    )

    params = heads.init_fastrcnn_snn(jax.random.PRNGKey(0), 12544, 64, 6)
    r = 160  # not a multiple of R_TILE -> exercises padding
    x = jnp.asarray(rng.uniform(0, 2.5, (r, 12544)).astype(np.float32))

    cls_x, reg_x, rates = heads.fastrcnn_snn_apply(
        params, x, t, collect_rates=True, compute_dtype=jnp.float32,
        fast_encoder=True,
    )
    with pltpu.force_tpu_interpret_mode():
        cls_p, reg_p, r6, r7 = fastrcnn_snn_pallas(
            x, params["fc6"]["w"], params["fc7"]["w"],
            params["cls_score"]["w"], params["bbox_pred"]["w"], t,
        )

    assert cls_p.shape == (r, 6) and reg_p.shape == (r, 24)
    # Kernel uses bf16 GEMM operands (fp32 state/accum); spikes may flip at
    # borderline membranes, so compare with spike-scale tolerances.
    np.testing.assert_allclose(np.asarray(cls_p), np.asarray(cls_x),
                               atol=0.15, rtol=0.1)
    np.testing.assert_allclose(np.asarray(r6), np.asarray(rates["fc6"]),
                               atol=3.0 / (t * 64))
