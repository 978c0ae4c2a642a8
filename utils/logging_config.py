"""Drop-in alias for the reference's `utils.logging_config` module path.
Implementation: rectified_flow_vision_tpu.utils.logging_config."""

from rectified_flow_vision_tpu.utils.logging_config import *  # noqa: F401,F403
