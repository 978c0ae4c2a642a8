"""Drop-in alias for the reference's `utils.metrics` module path.
Implementation: rectified_flow_vision_tpu.utils.metrics."""

from rectified_flow_vision_tpu.utils.metrics import *  # noqa: F401,F403
