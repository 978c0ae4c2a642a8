"""Typed configuration system.

The reference keeps one YAML (``configs/config.yaml``) but parses it with
three duplicated ``load_config()`` implementations (reference: main.py:33,
experiments/train_base.py:49, utils/download_data.py:15) and writes a
``config_quick.yaml`` that is never read back (reference: main.py:104-107).

This module is the single source of truth: dataclasses <-> YAML with the
*same key names* as the reference schema, one loader, and a quick-mode
overlay that is both applied in memory and round-trippable through the
written file.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional

import yaml

# Repo root = directory containing main.py / configs/.
_REPO_ROOT = Path(__file__).resolve().parent.parent
DEFAULT_CONFIG_PATH = _REPO_ROOT / "configs" / "config.yaml"
QUICK_CONFIG_PATH = _REPO_ROOT / "configs" / "config_quick.yaml"


@dataclass
class DataConfig:
    image_size: int = 64
    num_mock_images: int = 100
    data_dir: str = "data/mock_images"


@dataclass
class ModelConfig:
    channels: int = 64
    channel_mult: List[int] = field(default_factory=lambda: [1, 2, 4])
    num_res_blocks: int = 2
    attention_resolutions: List[int] = field(default_factory=lambda: [16, 8])
    dropout: float = 0.1
    # TPU-native extensions (absent keys default; YAML stays reference-compatible)
    backbone: str = "unet"  # "unet" | "dit"
    param_dtype: str = "float32"
    compute_dtype: str = "float32"  # training compute dtype
    sample_dtype: str = "bfloat16"  # inference/sampling compute dtype
    use_pallas: Optional[bool] = None  # None => auto (TPU backend only)
    remat: bool = False  # rematerialize transformer blocks (long sequences)
    # latent-diffusion pipeline (the DiT-256 target): train/sample the flow
    # in a ConvVAE's latent space instead of pixels
    latent: bool = False
    latent_channels: int = 4
    latent_downsample: int = 4  # spatial factor; latent size = image_size / this
    vae_epochs: int = 40  # auto-training epochs when the VAE ckpt is absent


@dataclass
class TrainingBaseConfig:
    epochs: int = 50
    batch_size: int = 16
    learning_rate: float = 1e-4
    num_timesteps: int = 1000
    save_every: int = 10
    # TPU-native extensions
    resume: bool = False          # restart from the latest train state
    ema_decay: float = 0.0        # >0 enables EMA params
    use_native_loader: bool = False
    # linear LR warmup over this many epochs before the cosine schedule
    # (0 = reference parity). Guards Adam's moments against early spikes —
    # the measured dit256 divergence mode (docs/DESIGN.md).
    warmup_epochs: float = 0.0


@dataclass
class TrainingRectifiedConfig:
    epochs: int = 30
    batch_size: int = 16
    learning_rate: float = 1e-4
    num_reflow_iterations: int = 2
    save_every: int = 10
    # TPU-native extensions
    resume: bool = False
    # --- distillation-recipe knobs (defaults reproduce the reference) ----
    # 0 => the reference's formula min(1000, num_mock_images * 10)
    # (reference: experiments/train_rectified.py:75-80)
    num_pairs: int = 0
    # 0 => the reference's num_timesteps // 10 teacher steps
    teacher_steps: int = 0
    # ODE integrator for teacher pair synthesis: euler (reference parity) |
    # midpoint | heun (2nd order; better targets from the curved base ODE)
    teacher_method: str = "euler"
    # initialise the student from the teacher's weights. The reference
    # deliberately comments this out (rectified_flow.py:77-78); the original
    # Rectified Flow recipe (Liu et al. 2022) initialises the k-th model
    # from the (k-1)-th — essential for the few-step distillation claim
    init_from_teacher: bool = False
    # t distribution for the coupled loss: uniform | logit_normal | u_shaped
    time_sampling: str = "uniform"
    # >0 trains an EMA of the student (saved as *_ema_* checkpoints)
    ema_decay: float = 0.0
    pair_batch_size: int = 64
    # distil from the base model's EMA weights (base_flow_ema_final) when
    # they exist. The benchmark's base@100 anchor evaluates the EMA
    # checkpoint (benchmark.prefer_ema), so the student should target the
    # same — better — teacher it is judged against. No-op when the base
    # run trained without ema_decay (reference parity: no EMA file).
    teacher_use_ema: bool = True
    # fraction of Reflow pairs built data-side: REAL images inverted
    # through the teacher ODE (x0 = ODE^-1(x1_data)) instead of teacher
    # samples — the student's quality ceiling becomes the data itself
    # (Simple ReFlow, arXiv:2410.07815). 0 = reference-parity forward
    # couplings only.
    data_pair_fraction: float = 0.0


@dataclass
class BenchmarkConfig:
    num_samples: int = 50
    steps_to_test: List[int] = field(
        default_factory=lambda: [1, 2, 4, 8, 16, 32, 64, 100]
    )
    num_runs: int = 5
    # batch for the dependency-chained throughput sweep (the credible
    # ms/img numbers on TPU); 0 disables and keeps latency-only columns
    throughput_batch: int = 256
    # number of reference/generated images for the quality benchmark
    # (more => tighter FID estimates; FID bias at n~100 can flip close
    # verdicts, so artifact runs use >=1000)
    quality_samples: int = 32
    # quality references come from a HELD-OUT synthetic eval set
    # (data/eval_<size>/, generated on demand with a fixed seed disjoint
    # from the training corpus) instead of the training images — FID then
    # measures generalization, and the reference count is not capped by
    # the training-corpus size. Set false to compare against the corpus
    # itself (the pre-r4 behavior; required when data_dir holds real
    # photos the synthetic recipe cannot match).
    heldout_reference: bool = True
    # cap on how many image pairs the host-side SSIM loop scores (0 = all
    # quality_samples). SSIM is a paired mean — n=256 is statistically
    # plenty — and at 256px each pair costs ~0.4 s on this 1-core host.
    ssim_samples: int = 0
    # evaluate *_ema_final checkpoints when present (EMA weights are the
    # production sampling weights whenever ema_decay > 0 during training)
    prefer_ema: bool = False


@dataclass
class MetricsConfig:
    compute_fid: bool = True
    compute_lpips: bool = True
    compute_ssim: bool = True


@dataclass
class PathsConfig:
    checkpoints: str = "checkpoints"
    results: str = "results"
    figures: str = "results/figures"


@dataclass
class ParallelConfig:
    """TPU-native extension: mesh layout. Not present in the reference."""

    data_axis: int = -1  # -1 => all remaining devices
    model_axis: int = 1  # tensor-parallel degree
    # FSDP (ZeRO-style): store params + Adam moments sharded over the
    # 'data' axis; GSPMD inserts the all-gathers / grad reduce-scatters
    fsdp: bool = False


@dataclass
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    training_base: TrainingBaseConfig = field(default_factory=TrainingBaseConfig)
    training_rectified: TrainingRectifiedConfig = field(
        default_factory=TrainingRectifiedConfig
    )
    benchmark: BenchmarkConfig = field(default_factory=BenchmarkConfig)
    metrics: MetricsConfig = field(default_factory=MetricsConfig)
    paths: PathsConfig = field(default_factory=PathsConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)

    # ---- dict/YAML round trip -------------------------------------------

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Config":
        cfg = cls()
        for section_name, section_value in (d or {}).items():
            if not hasattr(cfg, section_name):
                continue  # tolerate unknown sections (forward compat)
            section = getattr(cfg, section_name)
            if not dataclasses.is_dataclass(section) or not isinstance(
                section_value, dict
            ):
                continue
            known = {f.name for f in dataclasses.fields(section)}
            for k, v in section_value.items():
                if k in known:
                    setattr(section, k, v)
        return cfg

    def save(self, path: os.PathLike | str) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w") as f:
            yaml.dump(self.to_dict(), f, default_flow_style=False)


def load_config(path: Optional[os.PathLike | str] = None) -> Config:
    """Load the project config (the single loader).

    Falls back to built-in defaults (identical to the reference's
    configs/config.yaml values) when the file does not exist.
    """
    path = Path(path) if path is not None else DEFAULT_CONFIG_PATH
    if not path.exists():
        return Config()
    with open(path, "r") as f:
        raw = yaml.safe_load(f) or {}
    return Config.from_dict(raw)


def quick_overlay(cfg: Config) -> Config:
    """Apply the --quick demo overlay (reference: main.py:44-61).

    Unlike the reference, the quick demo writes its checkpoints/results
    under ``*/quick`` subdirectories: sharing the production paths means a
    5-epoch demo run silently overwrites a fully-trained flagship
    ``base_flow_final.npz`` (this happened; the reference has the same
    hazard and we do not reproduce it).
    """
    cfg.data.num_mock_images = 50
    cfg.training_base.epochs = 5
    cfg.training_base.batch_size = 8
    cfg.training_rectified.epochs = 3
    cfg.training_rectified.num_reflow_iterations = 1
    # the flagship's tuned 20k-pair recipe is minutes of teacher rollouts;
    # the quick demo wants seconds
    cfg.training_rectified.num_pairs = 500
    cfg.benchmark.num_samples = 10
    cfg.benchmark.steps_to_test = [1, 4, 16, 64]
    cfg.benchmark.num_runs = 2
    cfg.paths.checkpoints = str(Path(cfg.paths.checkpoints) / "quick")
    cfg.paths.results = str(Path(cfg.paths.results) / "quick")
    cfg.paths.figures = str(Path(cfg.paths.figures) / "quick")
    return cfg


def repo_root() -> Path:
    return _REPO_ROOT
