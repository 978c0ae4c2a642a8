"""Drop-in alias for the reference's `utils.download_data` module path.
Implementation: rectified_flow_vision_tpu.utils.download_data."""

from rectified_flow_vision_tpu.utils.download_data import *  # noqa: F401,F403
from rectified_flow_vision_tpu.utils.download_data import main  # noqa: F401

if __name__ == "__main__":
    main()
