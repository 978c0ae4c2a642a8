"""Drop-in alias for the reference's `utils.ssim` module path.
Implementation: rectified_flow_vision_tpu.utils.ssim."""

from rectified_flow_vision_tpu.utils.ssim import *  # noqa: F401,F403
