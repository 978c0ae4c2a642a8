"""Drop-in alias for the reference's `models.unet` module path.
Implementation: rectified_flow_vision_tpu.models.unet."""

from rectified_flow_vision_tpu.models.unet import *  # noqa: F401,F403
