"""rectified_flow_vision_tpu — a TPU-native rectified-flow (Reflow) framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
``AlbertGoTri/rectified-flow-vision`` project (PyTorch, single device):

* Flow-matching base model + Reflow distillation (teacher -> student pair
  synthesis -> straight-trajectory student, optionally iterated K times).
* UNet velocity-field backbone (reference: models/unet.py) rebuilt NHWC with
  Pallas-fused GroupNorm/SiLU and attention kernels.
* Euler ODE sampling compiled to a single ``jax.lax.scan`` executable.
* Data-parallel / tensor-parallel training over a ``jax.sharding.Mesh``.
* Benchmark + metrics + visualization parity (reference: experiments/,
  utils/metrics.py, utils/visualization.py).

Public API mirrors the reference's ``models/__init__.py`` exports so a user
of the reference can switch with minimal changes.
"""

__version__ = "0.1.0"

from rectified_flow_vision_tpu.models import (  # noqa: F401
    UNet,
    count_parameters,
    BaseFlowModel,
    train_base_flow,
    RectifiedFlowModel,
    generate_reflow_pairs,
    train_rectified_flow,
    iterative_reflow,
)

__all__ = [
    "UNet",
    "count_parameters",
    "BaseFlowModel",
    "train_base_flow",
    "RectifiedFlowModel",
    "generate_reflow_pairs",
    "train_rectified_flow",
    "iterative_reflow",
]
