"""Convolutional VAE: pixel space <-> latent space for the DiT-256 config.

The reference is pixel-space only (its largest config is 64x64 RGB). The
scaled DiT-S/2 256x256 target (BASELINE.json configs[4]) follows the
latent-diffusion recipe instead: a small KL-regularized autoencoder maps
256x256x3 images to 64x64x4 latents (4x spatial downsample), the
rectified-flow DiT trains and samples entirely in latent space, and the
decoder maps generated latents back to pixels. 64x64 latents patchified
at p=2 give 1024 tokens — the regime where the tuned Pallas flash
attention and the ring-attention sequence-parallel path engage.

Functional-pytree style like the other backbones: ``init`` -> params,
pure ``encode``/``decode``/``apply``. Latents are scaled by a calibration
factor (1/std of the trained encoder's output, the SD "scaling_factor"
pattern) so the flow model sees ~unit-variance data.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rectified_flow_vision_tpu.ops import primitives as P

Array = jax.Array
Params = Dict


class ConvVAE:
    """Small KL autoencoder. 4x spatial downsample, ``latent_channels`` out."""

    def __init__(
        self,
        image_size: int = 256,
        in_channels: int = 3,
        latent_channels: int = 4,
        base_channels: int = 64,
        downsample: int = 4,  # spatial factor (power of 2)
        scaling_factor: float = 1.0,
    ):
        if downsample & (downsample - 1):
            raise ValueError("downsample must be a power of 2")
        self.image_size = image_size
        self.in_channels = in_channels
        self.latent_channels = latent_channels
        self.base_channels = base_channels
        self.downsample = downsample
        self.num_levels = int(math.log2(downsample))
        self.scaling_factor = float(scaling_factor)

    @property
    def latent_size(self) -> int:
        return self.image_size // self.downsample

    @property
    def config(self) -> dict:
        return {
            "model_type": "ConvVAE",
            "image_size": self.image_size,
            "in_channels": self.in_channels,
            "latent_channels": self.latent_channels,
            "base_channels": self.base_channels,
            "downsample": self.downsample,
            "scaling_factor": self.scaling_factor,
        }

    # ---- params ------------------------------------------------------------

    def init(self, key: Array) -> Params:
        ks = iter(jax.random.split(key, 4 + 4 * self.num_levels))
        c = self.base_channels
        enc: Params = {"in": P.conv_init(next(ks), 3, 3, self.in_channels, c)}
        ch = c
        for lv in range(self.num_levels):
            nxt = min(ch * 2, 4 * c)
            enc[f"down{lv}"] = {
                "conv": P.conv_init(next(ks), 3, 3, ch, nxt),
                "norm": P.groupnorm_init(ch),
            }
            ch = nxt
        enc["out_norm"] = P.groupnorm_init(ch)
        enc["out"] = P.conv_init(next(ks), 3, 3, ch, 2 * self.latent_channels)

        dec: Params = {
            "in": P.conv_init(next(ks), 3, 3, self.latent_channels, ch)
        }
        for lv in range(self.num_levels):
            nxt = max(ch // 2, c)
            dec[f"up{lv}"] = {
                "conv": P.conv_init(next(ks), 3, 3, ch, nxt),
                "norm": P.groupnorm_init(ch),
            }
            ch = nxt
        dec["out_norm"] = P.groupnorm_init(ch)
        dec["out"] = P.conv_init(next(ks), 3, 3, ch, self.in_channels)
        return {"enc": enc, "dec": dec}

    # ---- forward -----------------------------------------------------------

    def _encode_raw(self, params: Params, x: Array) -> Tuple[Array, Array]:
        """x: [B,H,W,C] in [-1,1] -> (mu, logvar), each [B,h,w,latent_ch]."""
        e = params["enc"]
        h = P.conv2d(x, e["in"])
        for lv in range(self.num_levels):
            h = P.silu(P.group_norm(h, e[f"down{lv}"]["norm"]))
            h = P.conv2d(h, e[f"down{lv}"]["conv"], stride=2)
        h = P.silu(P.group_norm(h, e["out_norm"]))
        h = P.conv2d(h, e["out"])
        mu, logvar = jnp.split(h, 2, axis=-1)
        return mu, jnp.clip(logvar, -30.0, 20.0)

    def encode(
        self,
        params: Params,
        x: Array,
        rng: Optional[Array] = None,
    ) -> Array:
        """Deterministic (mu) or sampled latents, SCALED for the flow model."""
        mu, logvar = self._encode_raw(params, x)
        z = mu
        if rng is not None:
            z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mu.shape, mu.dtype
            )
        return z * self.scaling_factor

    def decode(self, params: Params, z: Array) -> Array:
        """Scaled latents [B,h,w,latent_ch] -> images [B,H,W,C] in [-1,1]."""
        d = params["dec"]
        h = P.conv2d(z / self.scaling_factor, d["in"])
        for lv in range(self.num_levels):
            h = P.silu(P.group_norm(h, d[f"up{lv}"]["norm"]))
            h = P.upsample_nearest_2x(h)
            h = P.conv2d(h, d[f"up{lv}"]["conv"])
        h = P.silu(P.group_norm(h, d["out_norm"]))
        return P.conv2d(h, d["out"])

    def apply(
        self, params: Params, x: Array, rng: Array
    ) -> Tuple[Array, Array, Array]:
        """(reconstruction, mu, logvar) — the training forward."""
        mu, logvar = self._encode_raw(params, x)
        z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(
            rng, mu.shape, mu.dtype
        )
        # decode() divides by scaling_factor; pre-scale so training runs on
        # the raw (uncalibrated) latents
        return self.decode(params, z * self.scaling_factor), mu, logvar

    # ---- persistence ---------------------------------------------------------

    def save(self, path: str, params: Params) -> None:
        from rectified_flow_vision_tpu.utils import checkpoint as ckpt_io

        ckpt_io.save_params(path, params, self.config)

    @classmethod
    def load(cls, path: str) -> Tuple["ConvVAE", Params]:
        from rectified_flow_vision_tpu.utils import checkpoint as ckpt_io

        params, config = ckpt_io.load_params(path)
        vae = cls(
            image_size=int(config["image_size"]),
            in_channels=int(config["in_channels"]),
            latent_channels=int(config["latent_channels"]),
            base_channels=int(config["base_channels"]),
            downsample=int(config["downsample"]),
            scaling_factor=float(config["scaling_factor"]),
        )
        return vae, params


def train_vae(
    vae: ConvVAE,
    images: np.ndarray,
    *,
    epochs: int = 40,
    batch_size: int = 32,
    lr: float = 2e-4,
    kl_weight: float = 1e-4,
    seed: int = 0,
    progress: bool = True,
) -> Tuple[Params, float]:
    """Train on an NHWC [-1,1] corpus; returns (params, final recon MSE).

    After training, ``vae.scaling_factor`` is calibrated so encoder outputs
    have ~unit variance (computed over the corpus), and is stored in the
    checkpoint config by ``vae.save``.
    """
    import optax

    params = vae.init(jax.random.key(seed))
    n = images.shape[0]
    batch_size = min(batch_size, n)  # tiny corpora: never skip every batch
    steps = max(n // batch_size, 1)
    tx = optax.adamw(optax.cosine_decay_schedule(lr, epochs * steps))
    opt = tx.init(params)

    def loss_fn(p, x, rng):
        recon, mu, logvar = vae.apply(p, x, rng)
        mse = jnp.mean(jnp.square(recon.astype(jnp.float32) - x))
        kl = -0.5 * jnp.mean(1 + logvar - mu**2 - jnp.exp(logvar))
        return mse + kl_weight * kl, mse

    @jax.jit
    def step(p, o, x, rng):
        (loss, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, x, rng
        )
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, mse

    rng = np.random.default_rng(seed)
    mse = float("nan")
    for epoch in range(epochs):
        perm = rng.permutation(n)
        mses = []
        for i in range(steps):
            sl = perm[i * batch_size : (i + 1) * batch_size]
            if len(sl) < batch_size:
                continue
            params, opt, mse_v = step(
                params,
                opt,
                jnp.asarray(images[sl]),
                jax.random.key(seed * 7919 + epoch * 1009 + i),
            )
            mses.append(mse_v)
        mse = float(jnp.mean(jnp.stack(mses)))
        if progress and (epoch + 1) % 5 == 0:
            print(f"[vae] epoch {epoch + 1}/{epochs} recon MSE {mse:.5f}", flush=True)

    # calibrate the latent scaling factor: latents ~ unit std for the flow
    # (batched: a single 256-image encode of 256x256 inputs OOMs on v5e)
    enc = jax.jit(lambda x: vae._encode_raw(params, x)[0])
    s = s2 = cnt = 0.0
    for i in range(0, min(n, 256), batch_size):
        mu = enc(jnp.asarray(images[i : i + batch_size]))
        if mu.shape[0] < batch_size:
            continue
        s += float(jnp.sum(mu))
        s2 += float(jnp.sum(mu * mu))
        cnt += mu.size
    var = max(s2 / cnt - (s / cnt) ** 2, 1e-12)
    vae.scaling_factor = float(1.0 / (var**0.5 + 1e-8))
    return params, mse


class LatentFlowPipeline:
    """Flow model in latent space + VAE decode: samples pixel images.

    Exposes the sampling surface the benchmark/serving code expects
    (``sample``, ``image_size``, ``in_channels``) while the underlying
    rectified flow runs at latent resolution.
    """

    def __init__(
        self,
        flow_model,
        vae: ConvVAE,
        vae_params: Params,
        decode_dtype=jnp.bfloat16,
    ):
        self.flow = flow_model
        self.vae = vae
        self.vae_params = vae_params
        self.image_size = vae.image_size
        self.in_channels = vae.latent_channels
        # bf16 decode by default: measured 4.7x faster on v5e (302.6 ->
        # 64.3 ms per 256 images at 256x256) with max abs err ~0.016 on
        # [-1,1] pixels (~2 uint8 levels); pass decode_dtype=jnp.float32
        # for bit-faithful decoding
        cast = jax.tree_util.tree_map(
            lambda a: a.astype(decode_dtype), vae_params
        )
        self._decode = jax.jit(
            lambda z: vae.decode(cast, z.astype(decode_dtype)).astype(
                jnp.float32
            )
        )

    def sample(
        self,
        noise: Optional[Array] = None,
        num_steps: int = 4,
        batch_size: int = 4,
        data_format: str = "NCHW",
        **kw,
    ) -> Array:
        """Latent-noise -> latent flow sampling -> decoded pixels.

        ``noise``, when given, is LATENT-shaped ([B, latent, h, w] for NCHW).
        """
        z = self.flow.sample(
            noise=noise,
            num_steps=num_steps,
            batch_size=batch_size,
            data_format=data_format,
            **kw,
        )
        z_nhwc = jnp.transpose(z, (0, 2, 3, 1)) if data_format == "NCHW" else z
        x = jnp.clip(self._decode(z_nhwc.astype(jnp.float32)), -1, 1)
        return jnp.transpose(x, (0, 3, 1, 2)) if data_format == "NCHW" else x
