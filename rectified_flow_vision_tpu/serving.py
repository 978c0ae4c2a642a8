"""Production sampling service: precompiled, steady-state image generation.

The reference has no serving story (research scripts only). This module
packages the sampler for deployment:

* ``SamplerService`` precompiles one XLA executable per configured
  (num_steps, batch, method) at startup — no compile hitches at request
  time — and serves ``generate`` calls from a seeded, monotonically
  advancing PRNG stream,
* requests of arbitrary ``n`` are served from the fixed-shape executables
  (largest-batch tiling + truncation), keeping XLA shapes static,
* optional mesh: batches shard over the 'data' axis for multi-chip serving.

Example:
    svc = SamplerService.from_checkpoint("checkpoints/rectified_flow_k1_final.npz",
                                         step_counts=(1, 2, 4), batch_size=256)
    images = svc.generate(1000, num_steps=4)   # [1000, C, H, W] in [-1, 1]
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rectified_flow_vision_tpu.models.base_flow import BaseFlowModel, _from_nhwc
from rectified_flow_vision_tpu.utils.logging_config import get_logger

log = get_logger("flow_vision.serving")


class SamplerService:
    """Precompiled few-step sampler around a trained flow model."""

    def __init__(
        self,
        model: BaseFlowModel,
        *,
        step_counts: Sequence[int] = (1, 2, 4, 8),
        batch_size: int = 256,
        method: str = "euler",
        seed: int = 0,
        mesh=None,
        warmup: bool = True,
        vae=None,
        vae_params=None,
    ):
        self.model = model
        self.batch_size = batch_size
        self.method = method
        self.step_counts = tuple(step_counts)
        self.mesh = mesh
        self._key = jax.random.key(seed)
        self._noise_shape = (
            batch_size, model.image_size, model.image_size, model.in_channels
        )
        # latent pipeline: the flow model samples latents, a jitted ConvVAE
        # decode maps them to pixel images before returning (bf16 decode:
        # 4.7x faster, ~2-uint8-level max deviation — see LatentFlowPipeline)
        self._decode = None
        if vae is not None:
            from rectified_flow_vision_tpu.models.autoencoder import (
                LatentFlowPipeline,
            )

            raw_decode = LatentFlowPipeline(model, vae, vae_params)._decode
            # clip inside the decode wrapper: the bf16 decoder can slightly
            # overshoot [-1, 1] and generate()'s contract (module docstring)
            # promises images in range, matching LatentFlowPipeline.sample
            self._decode = lambda z: jnp.clip(raw_decode(z), -1.0, 1.0)

        if mesh is not None:
            from rectified_flow_vision_tpu.parallel import mesh as mesh_lib

            self.model.params = mesh_lib.shard_params(mesh, self.model.params)

        self._samplers = {
            n: model._get_sampler(n, False, model.sample_dtype, method)
            for n in self.step_counts
        }
        if warmup:
            self.warmup()

    @classmethod
    def from_checkpoint(
        cls, path: str, *, vae_path: Optional[str] = None, **kwargs
    ) -> "SamplerService":
        """Load a flow checkpoint; ``vae_path`` makes it a latent service
        (sample latents, decode to pixels)."""
        model = BaseFlowModel.from_checkpoint(path)
        if vae_path is not None:
            from rectified_flow_vision_tpu.models.autoencoder import ConvVAE

            vae, vae_params = ConvVAE.load(vae_path)
            kwargs.update(vae=vae, vae_params=vae_params)
        return cls(model, **kwargs)

    # ---- lifecycle ---------------------------------------------------------

    def warmup(self) -> Dict[int, float]:
        """Compile every configured executable; returns compile seconds."""
        stats: Dict[int, float] = {}
        noise = jnp.zeros(self._noise_shape, jnp.float32)
        noise = self._place(noise)
        for n, sampler in self._samplers.items():
            t0 = time.perf_counter()
            out = sampler(self.model.params, noise)
            if self._decode is not None:
                out = self._decode(out)
            float(jnp.sum(out))  # force completion (tunnel-safe sync)
            stats[n] = time.perf_counter() - t0
            log.info("warmed num_steps=%d in %.1fs", n, stats[n])
        return stats

    def _place(self, arr):
        if self.mesh is None:
            return arr
        from rectified_flow_vision_tpu.parallel import mesh as mesh_lib

        return mesh_lib.shard_batch(self.mesh, arr)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    # ---- serving -------------------------------------------------------------

    def generate(
        self,
        n: int,
        num_steps: Optional[int] = None,
        *,
        data_format: str = "NCHW",
    ) -> np.ndarray:
        """Generate ``n`` images; always runs the precompiled batch shape."""
        num_steps = num_steps if num_steps is not None else self.step_counts[0]
        if num_steps not in self._samplers:
            raise ValueError(
                f"num_steps={num_steps} not precompiled; configured: "
                f"{self.step_counts}"
            )
        sampler = self._samplers[num_steps]

        outs = []
        remaining = n
        while remaining > 0:
            noise = jax.random.normal(
                self._next_key(), self._noise_shape, jnp.float32
            )
            out = sampler(self.model.params, self._place(noise))
            if self._decode is not None:
                out = self._decode(out)
            outs.append(out)
            remaining -= self.batch_size
        # generate()'s contract (module docstring) is images in [-1, 1]; the
        # latent path clips inside _decode, the pixel-space sampler can
        # slightly overshoot — clip here so both paths honour it.
        result = jnp.clip(jnp.concatenate(outs)[:n], -1.0, 1.0)
        return np.asarray(jax.device_get(_from_nhwc(result, data_format)))

    def throughput(self, num_steps: int, iters: int = 8) -> float:
        """Steady-state images/sec via dependency-chained timing."""
        sampler = self._samplers[num_steps]
        x = self._place(
            jax.random.normal(self._next_key(), self._noise_shape, jnp.float32)
        )
        out = sampler(self.model.params, x)
        if self._decode is not None:
            out = self._decode(out)
        float(jnp.sum(out))
        t0 = time.perf_counter()
        d = None
        for _ in range(iters):
            x = sampler(self.model.params, x)
            if self._decode is not None:
                d = self._decode(x)
        float(jnp.sum(x if d is None else d))
        return self.batch_size * iters / (time.perf_counter() - t0)


def main() -> None:
    """CLI: generate a grid of samples from a checkpoint.

    python -m rectified_flow_vision_tpu.serving \
        --checkpoint checkpoints/rectified_flow_k1_final.npz \
        --num 16 --steps 4 --out results/served.png
    """
    import argparse

    import numpy as np

    parser = argparse.ArgumentParser(description="Flow sampler service")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--num", type=int, default=16)
    parser.add_argument("--steps", type=int, default=4)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--method", default="euler",
                        choices=["euler", "midpoint", "heun"])
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", default="results/served_samples.png")
    parser.add_argument("--vae", default=None, metavar="VAE_NPZ",
                        help="ConvVAE checkpoint: serve a latent-space flow "
                             "model, decoding samples to pixels")
    parser.add_argument("--bench", action="store_true",
                        help="also print steady-state throughput")
    args = parser.parse_args()

    svc = SamplerService.from_checkpoint(
        args.checkpoint,
        vae_path=args.vae,
        step_counts=(args.steps,),
        batch_size=min(args.batch_size, max(args.num, 1)),
        method=args.method,
        seed=args.seed,
    )
    imgs = svc.generate(args.num, num_steps=args.steps)
    from rectified_flow_vision_tpu.utils.visualization import (
        plot_generated_samples,
    )

    plot_generated_samples(
        imgs, title=f"{args.steps}-step {args.method}", save_path=args.out
    )
    log.info("wrote %d samples to %s", args.num, args.out)
    if args.bench:
        log.info(
            "throughput: %.1f img/s at %d steps",
            svc.throughput(args.steps), args.steps,
        )


if __name__ == "__main__":
    main()
