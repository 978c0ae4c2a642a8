"""Drop-in alias for the reference's `experiments.train_base` module path.
Implementation: rectified_flow_vision_tpu.experiments.train_base."""

from rectified_flow_vision_tpu.experiments.train_base import *  # noqa: F401,F403
from rectified_flow_vision_tpu.experiments.train_base import main  # noqa: F401

if __name__ == "__main__":
    main()
