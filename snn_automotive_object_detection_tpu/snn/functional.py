"""LIF / LI neuron dynamics (norse 0.0.7 Euler semantics) in pure JAX.

The reference model's spiking behaviour is fully determined by three norse
functions pinned at version 0.0.7 (README.md:11-20):

  * ``lif_current_encoder`` — constant-current encoder
    (used at v_th=0.25, /root/reference/rpn.py:58,101 and
     faster_rcnn.py:444,494)
  * feed-forward LIF step (``LIFCell``) — synaptic current + membrane state
    (used at alpha=100, v_th=0.1, /root/reference/rpn.py:67,
     faster_rcnn.py:449-452)
  * leaky-integrator step (``LICell``) — non-spiking readout whose final
    membrane potential is emitted as the logits
    (/root/reference/rpn.py:71-75, faster_rcnn.py:456-468)

All steps use Euler integration with dt=0.001 and the norse defaults
tau_mem_inv=100 (1/10ms), tau_syn_inv=200 (1/5ms), v_leak=0, v_reset=0.
Update ordering matters and is reproduced exactly:

  LIF step: decay v with OLD i -> decay i -> spike on decayed v -> reset v
            -> THEN add the input current to i (one-step input latency).
  LI step:  jump i with input FIRST -> integrate v with jumped i -> decay i.

Spikes use the SuperSpike surrogate for training: forward is a heaviside,
backward is g / (alpha * |x| + 1)^2.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LIFParams(NamedTuple):
    """norse LIFParameters (0.0.7 defaults unless overridden)."""

    tau_syn_inv: float = 200.0  # 1 / 5e-3
    tau_mem_inv: float = 100.0  # 1 / 1e-2
    v_leak: float = 0.0
    v_th: float = 1.0
    v_reset: float = 0.0
    alpha: float = 100.0  # SuperSpike sharpness


class LIParams(NamedTuple):
    """norse LIParameters (0.0.7 defaults)."""

    tau_syn_inv: float = 200.0
    tau_mem_inv: float = 100.0
    v_leak: float = 0.0


# Reference operating points (rpn.py:58,67; faster_rcnn.py:444,449):
ENCODER_PARAMS = LIFParams(v_th=0.25)
LIF_PARAMS = LIFParams(v_th=0.1, alpha=100.0)
LI_PARAMS = LIParams()

DT = 0.001


@jax.custom_vjp
def heaviside_super(x: jnp.ndarray, alpha: float) -> jnp.ndarray:
    """Spike nonlinearity: forward heaviside(x > 0), backward SuperSpike.

    Matches norse ``threshold(x, "super", alpha)``:
      forward:  1.0 where x > 0 else 0.0
      backward: g / (alpha * |x| + 1)^2
    """
    return (x > 0).astype(x.dtype)


def _heaviside_fwd(x, alpha):
    return heaviside_super(x, alpha), (x, alpha)


def _heaviside_bwd(res, g):
    x, alpha = res
    grad = g / (alpha * jnp.abs(x) + 1.0) ** 2
    return (grad, None)


heaviside_super.defvjp(_heaviside_fwd, _heaviside_bwd)


def lif_current_encoder(
    input_current: jnp.ndarray,
    voltage: jnp.ndarray,
    p: LIFParams = ENCODER_PARAMS,
    dt: float = DT,
):
    """Constant-current LIF encoder step (norse ``lif_current_encoder``).

    Integrates the (constant) input current into the membrane and emits a
    spike + soft reset when it crosses v_th. Returns (z, v).
    """
    dv = dt * p.tau_mem_inv * ((p.v_leak - voltage) + input_current)
    voltage = voltage + dv
    z = heaviside_super(voltage - p.v_th, p.alpha)
    voltage = voltage - z * (voltage - p.v_reset)
    return z, voltage


class LIFState(NamedTuple):
    v: jnp.ndarray
    i: jnp.ndarray


class LIState(NamedTuple):
    v: jnp.ndarray
    i: jnp.ndarray


def lif_feed_forward_step(
    input_current: jnp.ndarray,
    state: LIFState,
    p: LIFParams = LIF_PARAMS,
    dt: float = DT,
):
    """Feed-forward LIF step (norse ``lif_feed_forward_step`` / ``LIFCell``).

    Returns (z, new_state). Note the input current only affects the membrane
    from the NEXT step (jump happens after the spike computation).
    """
    dv = dt * p.tau_mem_inv * ((p.v_leak - state.v) + state.i)
    v_decayed = state.v + dv

    di = -dt * p.tau_syn_inv * state.i
    i_decayed = state.i + di

    z = heaviside_super(v_decayed - p.v_th, p.alpha)
    v_new = (1.0 - z) * v_decayed + z * p.v_reset
    i_new = i_decayed + input_current
    return z, LIFState(v=v_new, i=i_new)


def li_feed_forward_step(
    input_current: jnp.ndarray,
    state: LIState,
    p: LIParams = LI_PARAMS,
    dt: float = DT,
):
    """Leaky-integrator step (norse ``li_feed_forward_step`` / ``LICell``).

    Non-spiking readout: returns (v_new, new_state) — the membrane potential
    is the output. The input jumps the synaptic current BEFORE the membrane
    update (norse LI ordering differs from LIF).
    """
    i_jump = state.i + input_current
    dv = dt * p.tau_mem_inv * ((p.v_leak - state.v) + i_jump)
    v_new = state.v + dv
    di = -dt * p.tau_syn_inv * i_jump
    i_decayed = i_jump + di
    return v_new, LIState(v=v_new, i=i_decayed)


def encoder_periods(
    x: jnp.ndarray,
    p: LIFParams = ENCODER_PARAMS,
    dt: float = DT,
) -> jnp.ndarray:
    """Closed-form spike period of the constant-current LIF encoder.

    For a CONSTANT input current x (exactly the reference's usage — the
    encoder re-integrates the same feature map every step,
    rpn.py:101/faster_rcnn.py:494), the membrane after m updates from reset
    is v_m = x * (1 - a^m) with a = 1 - dt*tau_mem_inv, and the hard reset
    restarts the identical trajectory. Spikes are therefore PERIODIC with
    period m* = min{m : v_m > v_th}: z_t = ((t+1) mod m* == 0).

    This removes the encoder's carried membrane state — the largest HBM
    round-trip in the SNN step loop — and replaces it with one int32 period
    map computed once. fp boundary cases are corrected against the pow-form
    membrane; elements that never spike get a huge period.
    """
    a = 1.0 - dt * p.tau_mem_inv
    xf = x.astype(jnp.float32)
    can_spike = xf > p.v_th
    r = jnp.where(can_spike, 1.0 - p.v_th / xf, 0.5)
    m = jnp.floor(jnp.log(r) / jnp.log(a)).astype(jnp.int32) + 1
    m = jnp.maximum(m, 1)
    # fp boundary corrections (strict inequality v_m > v_th).
    v_m = xf * (1.0 - a ** m.astype(jnp.float32))
    m = jnp.where(v_m <= p.v_th, m + 1, m)
    v_prev = xf * (1.0 - a ** (m - 1).astype(jnp.float32))
    m = jnp.where((m > 1) & (v_prev > p.v_th), m - 1, m)
    # uint8 keeps the per-step read at 1 byte/element; period 255 means
    # "never spikes within any practical T" (valid for T <= 254).
    m = jnp.where(can_spike, jnp.clip(m, 1, 255), 255)
    return m.astype(jnp.uint8)


def encoder_spikes_at(periods: jnp.ndarray, t: jnp.ndarray, dtype=jnp.float32):
    """Spike pattern of the constant-current encoder at step t (0-based)."""
    tt = (t + 1).astype(jnp.uint8)
    return (jnp.mod(tt, periods) == 0).astype(dtype)


def zeros_lif_state(shape, dtype=jnp.float32) -> LIFState:
    """Initial LIFCell state (norse inits v to v_leak=0, i to 0)."""
    return LIFState(v=jnp.zeros(shape, dtype), i=jnp.zeros(shape, dtype))


def zeros_li_state(shape, dtype=jnp.float32) -> LIState:
    return LIState(v=jnp.zeros(shape, dtype), i=jnp.zeros(shape, dtype))
