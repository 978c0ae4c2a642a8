"""Compute kernels: XLA primitives, fused Pallas TPU kernels, dispatch."""

from rectified_flow_vision_tpu.ops import primitives  # noqa: F401
from rectified_flow_vision_tpu.ops import fused  # noqa: F401
