"""Drop-in alias for the reference's `models.base_flow` module path.
Implementation: rectified_flow_vision_tpu.models.base_flow."""

from rectified_flow_vision_tpu.models.base_flow import *  # noqa: F401,F403
