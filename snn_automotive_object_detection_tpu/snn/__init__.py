"""Spiking-neuron primitives: LIF dynamics, surrogate gradients, fused kernels.

Reference-parity reimplementation of the norse 0.0.7 cells used by the
reference model (/root/reference/rpn.py:16-19, faster_rcnn.py:24-27):
``lif_current_encoder``, feed-forward ``LIFCell`` and the non-spiking leaky
integrator ``LICell`` — plus TPU-fused Pallas scan kernels for the hot heads.
"""

from snn_automotive_object_detection_tpu.snn.functional import (
    LIFParams,
    LIParams,
    heaviside_super,
    lif_current_encoder,
    lif_feed_forward_step,
    li_feed_forward_step,
)
