"""Drop-in alias for the reference's `experiments.benchmark` module path.
Implementation: rectified_flow_vision_tpu.experiments.benchmark."""

from rectified_flow_vision_tpu.experiments.benchmark import *  # noqa: F401,F403
from rectified_flow_vision_tpu.experiments.benchmark import main  # noqa: F401

if __name__ == "__main__":
    main()
