"""Jitted SPMD train / eval steps.

Data parallelism: the batch enters sharded over the "data" mesh axis, params
replicated; the mean loss over the global batch makes XLA insert the gradient
all-reduce that DDP did explicitly in the reference (train.py:702-712). Loss
values returned are already globally averaged, replacing reduce_dict
(utils.py:94-118).
"""

from __future__ import annotations

from functools import partial
import jax
import optax

from snn_automotive_object_detection_tpu.models.detector import detector_apply
from snn_automotive_object_detection_tpu.train.optim import merge_params


def make_train_step(config, optimizer: optax.GradientTransformation):
    """Returns step(trainable, frozen, opt_state, batch, rng) ->
    (trainable, opt_state, losses)."""

    def loss_fn(trainable, frozen, batch, rng):
        params = merge_params(trainable, frozen)
        _, losses = detector_apply(params, batch, config, training=True, rng=rng)
        total = sum(losses.values())
        return total, losses

    @partial(jax.jit, donate_argnums=(0, 2))
    def step(trainable, frozen, opt_state, batch, rng):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, frozen, batch, rng
        )
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        losses["loss_total"] = total
        return trainable, opt_state, losses

    return step


def make_eval_step(config, collect_rates: bool = False):
    """Returns step(params, batch) -> detections dict (fixed capacity)."""

    @jax.jit
    def step(params, batch):
        det, _ = detector_apply(
            params, batch, config, training=False, collect_rates=collect_rates
        )
        return det

    return step


def make_val_loss_step(config):
    """Validation-loss step: runs the TRAINING losses without updating, the
    reference's validate_one_epoch (train.py:203-230 — model kept in train()
    mode under no_grad)."""

    @jax.jit
    def step(params, batch, rng):
        _, losses = detector_apply(params, batch, config, training=True, rng=rng)
        losses["loss_total"] = sum(losses.values())
        return losses

    return step
