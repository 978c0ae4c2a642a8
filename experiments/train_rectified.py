"""Drop-in alias for the reference's `experiments.train_rectified` module path.
Implementation: rectified_flow_vision_tpu.experiments.train_rectified."""

from rectified_flow_vision_tpu.experiments.train_rectified import *  # noqa: F401,F403
from rectified_flow_vision_tpu.experiments.train_rectified import main  # noqa: F401

if __name__ == "__main__":
    main()
