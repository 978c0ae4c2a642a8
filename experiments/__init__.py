"""Drop-in alias for the reference's top-level ``experiments`` package.
Implementation: ``rectified_flow_vision_tpu.experiments``."""

from rectified_flow_vision_tpu.experiments import (  # noqa: F401
    benchmark,
    train_base,
    train_rectified,
)
