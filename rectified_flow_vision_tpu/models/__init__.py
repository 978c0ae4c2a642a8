"""Model zoo: UNet backbone, flow-matching base model, rectified (Reflow)
student, and the reflow training pipeline.

Mirrors the reference public API (reference: models/__init__.py:14-23).
"""

from rectified_flow_vision_tpu.models.unet import UNet, count_parameters
from rectified_flow_vision_tpu.models.base_flow import BaseFlowModel, train_base_flow
from rectified_flow_vision_tpu.models.rectified_flow import (
    RectifiedFlowModel,
    generate_reflow_pairs,
    train_rectified_flow,
    iterative_reflow,
)

__all__ = [
    "UNet",
    "count_parameters",
    "BaseFlowModel",
    "train_base_flow",
    "RectifiedFlowModel",
    "generate_reflow_pairs",
    "train_rectified_flow",
    "iterative_reflow",
]
