"""Drop-in alias for the reference's top-level ``models`` package.

The reference exposes ``from models import BaseFlowModel, ...``
(reference: models/__init__.py:14-23); this thin alias lets code written
against the reference import the same names from the same place. The real
implementation lives in ``rectified_flow_vision_tpu.models``.
"""

from rectified_flow_vision_tpu.models import (  # noqa: F401
    UNet,
    count_parameters,
    BaseFlowModel,
    train_base_flow,
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
