"""Drop-in alias for the reference's `utils.visualization` module path.
Implementation: rectified_flow_vision_tpu.utils.visualization."""

from rectified_flow_vision_tpu.utils.visualization import *  # noqa: F401,F403
