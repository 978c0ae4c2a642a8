"""Drop-in alias for the reference's `models.dit` module path.
Implementation: rectified_flow_vision_tpu.models.dit."""

from rectified_flow_vision_tpu.models.dit import *  # noqa: F401,F403
