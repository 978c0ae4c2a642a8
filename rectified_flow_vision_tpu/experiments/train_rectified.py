"""Train the rectified (Reflow) model (reference: experiments/train_rectified.py).

Same flow as the reference main(): load trained base checkpoint (fresh model
with a warning otherwise, :39-64) -> single Reflow round (pair synthesis
with num_timesteps//10 teacher steps, :75-80; student training, :83-92) ->
optional iterative Reflow when num_reflow_iterations > 1 (:99-120) ->
straightness report (:128-139 — including the base-model straightness the
reference silently drops at :136).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from rectified_flow_vision_tpu.config import Config, load_config, repo_root
from rectified_flow_vision_tpu.models import (
    BaseFlowModel,
    RectifiedFlowModel,
    generate_reflow_pairs,
    iterative_reflow,
    train_rectified_flow,
)
from rectified_flow_vision_tpu.utils.logging_config import get_logger

log = get_logger("flow_vision.train_rectified")


def _build_base_model(cfg: Config) -> BaseFlowModel:
    from rectified_flow_vision_tpu.experiments.train_base import build_model

    return build_model(cfg)


def _resolve_teacher_path(cfg: Config, checkpoint_dir):
    """Pick the base checkpoint the student distils from.

    Prefers ``base_flow_ema_final.npz`` when it exists (and
    ``teacher_use_ema`` is set): the benchmark's base@100 quality anchor
    evaluates the EMA weights under ``benchmark.prefer_ema``, so the
    student should target the same — better — teacher it is judged
    against. Reference parity is unaffected: a run without
    ``training_base.ema_decay`` writes no EMA file.
    """
    base_path = checkpoint_dir / "base_flow_final.npz"
    ema_path = checkpoint_dir / "base_flow_ema_final.npz"
    if getattr(cfg.training_rectified, "teacher_use_ema", True) and ema_path.exists():
        return ema_path
    return base_path


def _flow_space_corpus(cfg: Config, checkpoint_dir) -> np.ndarray:
    """The training corpus in the flow model's space (NHWC numpy).

    Pixel configs: the resized/normalized images themselves. Latent
    configs: the pixel corpus encoded through the (already trained)
    ConvVAE — data-side Reflow couplings must live where the ODE does.
    """
    from rectified_flow_vision_tpu.data import ImageDataset
    from rectified_flow_vision_tpu.experiments.train_base import (
        encode_dataset,
        ensure_vae,
    )

    data_dir = repo_root() / cfg.data.data_dir
    dataset = ImageDataset(str(data_dir), cfg.data.image_size)
    if getattr(cfg.model, "latent", False):
        vae, vae_params = ensure_vae(cfg, dataset, checkpoint_dir)
        return encode_dataset(vae, vae_params, dataset.images).images
    return dataset.images


def main(config: Optional[Config] = None, *, mesh=None) -> RectifiedFlowModel:
    cfg = config if config is not None else load_config()
    if mesh is None:
        from rectified_flow_vision_tpu.experiments.train_base import default_mesh

        mesh = default_mesh(cfg)

    checkpoint_dir = repo_root() / cfg.paths.checkpoints
    checkpoint_dir.mkdir(parents=True, exist_ok=True)

    base_path = _resolve_teacher_path(cfg, checkpoint_dir)
    base_model = _build_base_model(cfg)
    if base_path.exists():
        log.info("Loading base model from: %s", base_path)
        base_model.load(str(base_path))
    else:
        log.warning(
            "Trained base model not found (%s). Run train_base first. "
            "Using an untrained base model for demo...",
            base_path,
        )

    log.info("=" * 60)
    log.info("TRAINING RECTIFIED MODEL (Single Reflow)")
    log.info("=" * 60)

    tr = cfg.training_rectified
    rect_model = RectifiedFlowModel.from_base_model(
        base_model, copy_weights=tr.init_from_teacher
    )

    # distillation-recipe knobs; the 0-defaults reproduce the reference's
    # formulas (experiments/train_rectified.py:75-80)
    num_pairs = tr.num_pairs or min(1000, cfg.data.num_mock_images * 10)
    teacher_steps = tr.teacher_steps or cfg.training_base.num_timesteps // 10
    data_frac = getattr(tr, "data_pair_fraction", 0.0)
    real_data = (
        _flow_space_corpus(cfg, checkpoint_dir) if data_frac > 0 else None
    )
    x0_data, x1_data = generate_reflow_pairs(
        base_model,
        num_pairs=num_pairs,
        num_steps=teacher_steps,
        data_format="NHWC",
        batch_size=tr.pair_batch_size,
        method=tr.teacher_method,
        real_data=real_data,
        data_pair_fraction=data_frac,
    )

    losses = train_rectified_flow(
        model=rect_model,
        x0_data=x0_data,
        x1_data=x1_data,
        epochs=tr.epochs,
        batch_size=tr.batch_size,
        lr=tr.learning_rate,
        save_path=str(checkpoint_dir / "rectified_flow_k1"),
        save_every=tr.save_every,
        data_format="NHWC",
        mesh=mesh,
        resume_dir=(
            str(checkpoint_dir / "state_rectified_k1")
            if tr.resume
            else None
        ),
        fsdp=cfg.parallel.fsdp,
        ema_decay=tr.ema_decay or None,
        time_sampling=tr.time_sampling,
    )

    np.save(str(checkpoint_dir / "rectified_flow_k1_losses.npy"), losses)

    if tr.ema_decay:
        # production sampling weights: the benchmark evaluates the
        # *_ema_final checkpoint when benchmark.prefer_ema is set; keep the
        # in-memory model on them too so the straightness report matches
        from rectified_flow_vision_tpu.utils import checkpoint as ckpt_io

        ema_params, _ = ckpt_io.load_params(
            str(checkpoint_dir / "rectified_flow_k1_ema_final.npz")
        )
        rect_model.params = jax.tree_util.tree_map(
            np.asarray, ema_params
        )

    num_reflow_iters = tr.num_reflow_iterations
    if num_reflow_iters > 1:
        log.info("=" * 60)
        log.info("TRAINING ITERATIVE REFLOW (K=%d)", num_reflow_iters)
        log.info("=" * 60)
        models = iterative_reflow(
            initial_model=base_model,
            num_iterations=num_reflow_iters,
            epochs_per_iter=tr.epochs // num_reflow_iters,
            num_pairs=num_pairs,
            teacher_steps=teacher_steps,
            lr=tr.learning_rate,
            save_dir=str(checkpoint_dir),
            mesh=mesh,
            fsdp=cfg.parallel.fsdp,
            pair_batch_size=tr.pair_batch_size,
            init_from_teacher=tr.init_from_teacher,
            teacher_method=tr.teacher_method,
            time_sampling=tr.time_sampling,
            ema_decay=tr.ema_decay or None,
            real_data=real_data,
            data_pair_fraction=data_frac,
        )
        log.info("Created %d iteratively rectified models", len(models))

    log.info("Reflow training completed!")
    log.info("Model saved to: %s", checkpoint_dir / "rectified_flow_k1_final.npz")

    # Straightness comparison (the reference intends this at :128-139 but
    # drops the base value; report both here).
    log.info("Comparing trajectory straightness...")
    key = jax.random.key(42)
    x0_test = np.asarray(
        jax.random.normal(
            key,
            (4, base_model.image_size, base_model.image_size,
             base_model.in_channels),  # latent-sized for latent configs
        )
    )
    x1_test = np.asarray(
        jax.device_get(
            base_model.sample(noise=x0_test, num_steps=100, data_format="NHWC")
        )
    )
    base_straightness = RectifiedFlowModel.compute_straightness(
        base_model, x0_test, x1_test, data_format="NHWC"
    )
    rect_straightness = rect_model.compute_straightness(
        x0_test, x1_test, data_format="NHWC"
    )
    log.info("Base model straightness:      %.4f", base_straightness)
    log.info("Rectified model straightness: %.4f", rect_straightness)
    log.info("(Lower value = straighter trajectories)")
    return rect_model


def _cli() -> None:
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--config", default=None, metavar="YAML",
        help="config file (default: configs/config.yaml)",
    )
    args = parser.parse_args()
    main(load_config(args.config) if args.config else None)


if __name__ == "__main__":
    _cli()
