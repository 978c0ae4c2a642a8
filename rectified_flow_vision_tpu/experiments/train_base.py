"""Train the base flow model (reference: experiments/train_base.py).

Same flow as the reference main(): load config -> ensure data (synthesize
if missing, :71-75) -> dataset -> model -> train -> save losses .npy ->
smoke-sample. Module is runnable both as
``python -m rectified_flow_vision_tpu.experiments.train_base`` and through
``main.py``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from rectified_flow_vision_tpu.config import Config, load_config, repo_root
from rectified_flow_vision_tpu.data import ImageDataset  # noqa: F401 - public
# re-export (the reference exposes ImageDataset/load_config from this module,
# reference: experiments/train_base.py:20,49, and train_rectified imports them)
from rectified_flow_vision_tpu.models import BaseFlowModel, train_base_flow
from rectified_flow_vision_tpu.utils.logging_config import get_logger

log = get_logger("flow_vision.train_base")


def build_model(cfg: Config, cls=BaseFlowModel):
    """Construct the configured model (unet or dit backbone).

    With ``model.latent`` the flow model lives in the ConvVAE's latent
    space: image_size and channels are the LATENT dimensions.
    """
    latent = getattr(cfg.model, "latent", False)
    image_size = cfg.data.image_size
    in_channels = 3
    if latent:
        image_size = cfg.data.image_size // cfg.model.latent_downsample
        in_channels = cfg.model.latent_channels
    kwargs = dict(
        image_size=image_size,
        in_channels=in_channels,
        compute_dtype=cfg.model.compute_dtype,
        sample_dtype=cfg.model.sample_dtype,
        use_pallas=cfg.model.use_pallas,
        backbone=cfg.model.backbone,
    )
    if cfg.model.backbone == "dit":
        kwargs.update(remat=cfg.model.remat)
    else:
        kwargs.update(
            model_channels=cfg.model.channels,
            channel_mult=cfg.model.channel_mult,
            num_res_blocks=cfg.model.num_res_blocks,
            attention_resolutions=cfg.model.attention_resolutions,
            dropout=cfg.model.dropout,
        )
    return cls(**kwargs)


def ensure_vae(cfg: Config, dataset, checkpoint_dir):
    """Load the config's ConvVAE, training + saving it first if absent."""
    from rectified_flow_vision_tpu.models.autoencoder import ConvVAE, train_vae

    vae_path = checkpoint_dir / "vae.npz"
    if vae_path.exists():
        return ConvVAE.load(str(vae_path))
    log.info(
        "Training the ConvVAE (%dx -> %dx%d latents, %d epochs)...",
        cfg.model.latent_downsample,
        cfg.data.image_size // cfg.model.latent_downsample,
        cfg.model.latent_channels,
        cfg.model.vae_epochs,
    )
    vae = ConvVAE(
        image_size=cfg.data.image_size,
        latent_channels=cfg.model.latent_channels,
        downsample=cfg.model.latent_downsample,
    )
    params, mse = train_vae(
        vae, dataset.images, epochs=cfg.model.vae_epochs
    )
    vae.save(str(vae_path), params)
    log.info("VAE trained: recon MSE %.5f -> %s", mse, vae_path)
    return vae, params


def encode_dataset(vae, vae_params, images, batch: int = 64):
    """Encode an NHWC pixel corpus into an ArrayDataset of latents."""
    import jax
    import jax.numpy as jnp

    from rectified_flow_vision_tpu.data import ArrayDataset

    enc = jax.jit(lambda x: vae.encode(vae_params, x))
    lat = np.concatenate(
        [
            np.asarray(enc(jnp.asarray(images[i : i + batch])))
            for i in range(0, images.shape[0], batch)
        ]
    )
    return ArrayDataset(lat)


def default_mesh(cfg: Config):
    """Mesh from the config's parallel section; None on a single device."""
    import jax

    from rectified_flow_vision_tpu.parallel import create_mesh

    if len(jax.devices()) == 1 and cfg.parallel.model_axis == 1:
        return None
    return create_mesh(
        data_axis=cfg.parallel.data_axis, model_axis=cfg.parallel.model_axis
    )


def main(config: Optional[Config] = None, *, mesh=None) -> BaseFlowModel:
    cfg = config if config is not None else load_config()
    if mesh is None:
        mesh = default_mesh(cfg)

    checkpoint_dir = repo_root() / cfg.paths.checkpoints
    checkpoint_dir.mkdir(parents=True, exist_ok=True)

    data_dir = repo_root() / cfg.data.data_dir
    if not data_dir.exists() or not any(data_dir.iterdir()):
        log.info("No data found; generating synthetic data for demo...")
        from rectified_flow_vision_tpu.utils.download_data import (
            generate_synthetic_images,
        )

        generate_synthetic_images(
            str(data_dir), cfg.data.num_mock_images, cfg.data.image_size
        )

    dataset = ImageDataset(str(data_dir), cfg.data.image_size)

    vae = vae_params = None
    if getattr(cfg.model, "latent", False):
        vae, vae_params = ensure_vae(cfg, dataset, checkpoint_dir)
        log.info(
            "Latent pipeline: %dx%dx%d -> %dx%dx%d (scaling %.3f)",
            cfg.data.image_size, cfg.data.image_size, 3,
            vae.latent_size, vae.latent_size, vae.latent_channels,
            vae.scaling_factor,
        )
        dataset = encode_dataset(vae, vae_params, dataset.images)

    model = build_model(cfg)
    log.info("Model created with %s parameters", f"{model.num_parameters():,}")

    log.info("=" * 60)
    log.info("TRAINING BASE MODEL")
    log.info("=" * 60)

    losses = train_base_flow(
        model=model,
        dataloader=dataset,
        epochs=cfg.training_base.epochs,
        lr=cfg.training_base.learning_rate,
        save_path=str(checkpoint_dir / "base_flow"),
        save_every=cfg.training_base.save_every,
        batch_size=cfg.training_base.batch_size,
        mesh=mesh,
        resume_dir=(
            str(checkpoint_dir / "state_base")
            if cfg.training_base.resume
            else None
        ),
        use_native_loader=cfg.training_base.use_native_loader,
        ema_decay=cfg.training_base.ema_decay or None,
        fsdp=cfg.parallel.fsdp,
        warmup_epochs=getattr(cfg.training_base, "warmup_epochs", 0.0),
    )

    np.save(str(checkpoint_dir / "base_flow_losses.npy"), losses)

    log.info("Training completed!")
    log.info("Model saved to: %s", checkpoint_dir / "base_flow_final.npz")

    log.info("Generating test samples...")
    if vae is not None:
        from rectified_flow_vision_tpu.models.autoencoder import (
            LatentFlowPipeline,
        )

        pipeline = LatentFlowPipeline(model, vae, vae_params)
        samples = pipeline.sample(batch_size=4, num_steps=50)
    else:
        samples = model.sample(batch_size=4, num_steps=50)
    log.info("Generated samples: %s", tuple(samples.shape))
    return model


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
