"""Drop-in alias for the reference's `utils.checkpoint` module path.
Implementation: rectified_flow_vision_tpu.utils.checkpoint."""

from rectified_flow_vision_tpu.utils.checkpoint import *  # noqa: F401,F403
