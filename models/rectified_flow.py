"""Drop-in alias for the reference's `models.rectified_flow` module path.
Implementation: rectified_flow_vision_tpu.models.rectified_flow."""

from rectified_flow_vision_tpu.models.rectified_flow import *  # noqa: F401,F403
