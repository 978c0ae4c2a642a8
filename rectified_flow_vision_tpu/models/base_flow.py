"""Flow-matching base model (linear interpolation path) + trainer.

Capability parity with the reference BaseFlowModel (reference:
models/base_flow.py:24-226) and ``train_base_flow`` (:229-293):

* path:   x_t = (1-t) x0 + t x1, target velocity v = x1 - x0,
* loss:   MSE of the UNet velocity prediction at t ~ U[0,1], x0 ~ N(0,I),
* sampler: Euler ODE integration with left-endpoint times t_i = i/N,
* trainer: AdamW + per-epoch cosine LR + global-norm-1.0 gradient clipping,
  checkpoints every ``save_every`` epochs plus ``_final``.

TPU-native design (not a port):

* the whole Euler loop is ONE ``jax.lax.scan`` inside ONE ``jax.jit`` —
  an N-step sample is a single XLA executable (the reference runs a Python
  loop of N synchronous forwards, base_flow.py:163-170). Executables are
  cached per (num_steps, shape, dtype),
* model compute runs in bfloat16 during sampling while the integration
  state stays float32 (MXU throughput without integrator drift),
* the train step (loss + grad + clip + optax update) is ONE jitted,
  donated function, data-parallel over a ('data',) mesh axis via
  NamedSharding — gradient averaging is implicit in sharded jit,
* PRNG is explicit: every stochastic op takes a key split from a seeded
  root (the reference uses torch's global RNG, base_flow.py:117-120).

Public array API defaults to NCHW for drop-in compatibility with the
reference; pass ``data_format="NHWC"`` to stay in the TPU-native layout.
"""

from __future__ import annotations

import functools
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rectified_flow_vision_tpu.models.unet import UNet, count_parameters
from rectified_flow_vision_tpu.ops import fused
from rectified_flow_vision_tpu.utils import checkpoint as ckpt_io
from rectified_flow_vision_tpu.utils.logging_config import get_logger

Array = jax.Array
Params = Dict[str, Any]

log = get_logger("flow_vision.models")

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}


def _to_nhwc(x, data_format: str):
    if hasattr(x, "detach"):  # torch tensor at the drop-in boundary
        x = x.detach().cpu().numpy()
    x = jnp.asarray(x)
    if data_format.upper() == "NCHW":
        return jnp.transpose(x, (0, 2, 3, 1))
    return x


def _from_nhwc(x, data_format: str):
    if data_format.upper() == "NCHW":
        return jnp.transpose(x, (0, 3, 1, 2))
    return x


class BaseFlowModel:
    """Flow-matching model: a UNet velocity field + flow math + sampler."""

    def __init__(
        self,
        image_size: int = 64,
        in_channels: int = 3,
        model_channels: int = 64,
        channel_mult: Sequence[int] = (1, 2, 4),
        num_res_blocks: int = 2,
        attention_resolutions: Sequence[int] = (16, 8),
        dropout: float = 0.1,
        *,
        backbone: str = "unet",
        patch_size: int = 2,
        hidden_size: int = 384,
        depth: int = 12,
        num_heads: int = 6,
        mlp_ratio: float = 4.0,
        dit_size: Optional[str] = None,
        remat: bool = False,
        seed: int = 0,
        params: Optional[Params] = None,
        compute_dtype: str = "float32",
        sample_dtype: str = "bfloat16",
        use_pallas: Optional[bool] = None,
        device: Optional[str] = None,  # accepted for API parity; unused (JAX
        # places arrays via shardings, not device strings)
    ):
        self.image_size = image_size
        self.in_channels = in_channels
        self.backbone = backbone
        if backbone == "dit":
            from rectified_flow_vision_tpu.models.dit import DiT

            self.velocity_net = DiT(
                input_size=image_size,
                patch_size=patch_size,
                in_channels=in_channels,
                hidden_size=hidden_size,
                depth=depth,
                num_heads=num_heads,
                mlp_ratio=mlp_ratio,
                size=dit_size,
                remat=remat,
            )
        elif backbone == "unet":
            self.velocity_net = UNet(
                in_channels=in_channels,
                model_channels=model_channels,
                out_channels=in_channels,
                channel_mult=channel_mult,
                num_res_blocks=num_res_blocks,
                attention_resolutions=attention_resolutions,
                dropout=dropout,
            )
        else:
            raise ValueError(f"unknown backbone {backbone!r} (unet|dit)")
        self.remat = bool(remat)
        self.compute_dtype = _DTYPES[compute_dtype]
        self.sample_dtype = _DTYPES[sample_dtype]
        if use_pallas is None:
            # Measured on v5e: XLA's own fusion beats the per-image-grid
            # Pallas gn_silu/attention kernels for the UNet (2194 vs 1174
            # img/s at 64x64 4-step) — auto keeps them off there. The DiT
            # path defaults on: its flash-attention kernel is required for
            # long token sequences (>=1024) and is a no-op below that.
            self.use_pallas = backbone == "dit" and fused.pallas_available()
        else:
            self.use_pallas = bool(use_pallas) and fused.pallas_available()
        # Fused gn_silu+dropout kernel gate (it WINS, unlike the forward
        # kernels): None => auto-on when shapes allow; an EXPLICIT
        # use_pallas bool also governs it, so use_pallas=False is a real
        # all-Pallas kill switch
        self.pallas_dropout: Optional[bool] = (
            None if use_pallas is None else bool(use_pallas)
        )

        self._rng = jax.random.key(seed)
        self.params: Params = (
            params if params is not None else self.velocity_net.init(self._split())
        )
        self._sampler_cache: Dict[tuple, Any] = {}
        self._velocity_jit = None

    # ---- config / identity ------------------------------------------------

    @property
    def config(self) -> dict:
        c = self.velocity_net.cfg
        base = {
            "model_type": type(self).__name__,
            "image_size": self.image_size,
            "in_channels": self.in_channels,
            "backbone": self.backbone,
        }
        if self.backbone == "dit":
            base.update(
                patch_size=c.patch_size,
                hidden_size=c.hidden_size,
                depth=c.depth,
                num_heads=c.num_heads,
                mlp_ratio=c.mlp_ratio,
                remat=c.remat,
            )
        else:
            base.update(
                model_channels=c.model_channels,
                channel_mult=list(c.channel_mult),
                num_res_blocks=c.num_res_blocks,
                attention_resolutions=list(c.attention_resolutions),
                dropout=c.dropout,
            )
        return base

    def num_parameters(self) -> int:
        return count_parameters(self.params)

    def _split(self) -> Array:
        self._rng, sub = jax.random.split(self._rng)
        return sub

    # ---- flow math ---------------------------------------------------------

    @staticmethod
    def get_interpolation(x0: Array, x1: Array, t: Array) -> Tuple[Array, Array]:
        """Linear interpolation x_t and target velocity (x1 - x0).

        Layout-agnostic: t [B] broadcasts over all trailing dims.
        (reference: models/base_flow.py:67-89)
        """
        x0, x1 = jnp.asarray(x0), jnp.asarray(x1)
        t = jnp.asarray(t).reshape((-1,) + (1,) * (x0.ndim - 1)).astype(x0.dtype)
        x_t = (1.0 - t) * x0 + t * x1
        target = x1 - x0
        return x_t, target

    def loss_fn(
        self,
        params: Params,
        x1: Array,
        rng: Array,
        *,
        x0: Optional[Array] = None,
        train: bool = True,
        time_sampling: str = "uniform",
        pallas_dropout: Optional[bool] = None,
        pallas_mesh=None,
    ) -> Array:
        """Pure flow-matching loss on an NHWC batch (used inside train jit).

        x0 given => coupled-pair (reflow) loss; x0 None => fresh noise.

        ``time_sampling``: "uniform" (reference parity, base_flow.py:120),
        "logit_normal" (SD3-style, concentrates capacity at mid-path where
        the velocity is hardest), or "u_shaped" (emphasizes the endpoints —
        useful for few-step distillation per the Simple-ReFlow line of
        work).
        """
        k_noise, k_t, k_drop = jax.random.split(rng, 3)
        if x0 is None:
            x0 = jax.random.normal(k_noise, x1.shape, x1.dtype)
        batch = x1.shape[0]
        if time_sampling == "uniform":
            t = jax.random.uniform(k_t, (batch,), jnp.float32)
        elif time_sampling == "logit_normal":
            t = jax.nn.sigmoid(jax.random.normal(k_t, (batch,), jnp.float32))
        elif time_sampling == "u_shaped":
            # arcsine law: density 1/(pi*sqrt(t(1-t))), peaked at both ends
            u = jax.random.uniform(k_t, (batch,), jnp.float32)
            t = 0.5 - 0.5 * jnp.cos(jnp.pi * u)
        else:
            raise ValueError(f"unknown time_sampling {time_sampling!r}")
        x_t, target = self.get_interpolation(x0, x1, t)
        if pallas_dropout is None:  # None => inherit the model's setting
            pallas_dropout = self.pallas_dropout
        extra = (
            {
                "remat": self.remat,
                "pallas_dropout": pallas_dropout,
                "pallas_mesh": pallas_mesh,
            }
            if self.backbone == "unet"
            else {}
        )  # DiT takes remat at construction (cfg.remat) and has no dropout
        pred = self.velocity_net.apply(
            params,
            x_t,
            t,
            train=train,
            rng=k_drop,
            compute_dtype=self.compute_dtype,
            use_pallas=self.use_pallas,
            **extra,
        )
        return jnp.mean(jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32)))

    def compute_loss(
        self, x1, rng: Optional[Array] = None, data_format: str = "NCHW"
    ) -> Array:
        """Convenience loss on a data batch (reference: base_flow.py:104-131)."""
        x1 = _to_nhwc(x1, data_format)
        rng = rng if rng is not None else self._split()
        return self.loss_fn(self.params, x1, rng, train=False)

    # ---- inference ----------------------------------------------------------

    def forward(self, x, t, data_format: str = "NCHW") -> Array:
        """Predict the velocity field v(x, t) (reference: base_flow.py:91-102)."""
        # cache keyed on the attributes the closure bakes in, so toggling
        # compute_dtype / use_pallas after a first call takes effect
        key = (jnp.dtype(self.compute_dtype).name, bool(self.use_pallas))
        if self._velocity_jit is None or self._velocity_jit[0] != key:
            net = self.velocity_net
            compute_dtype, use_pallas = self.compute_dtype, self.use_pallas

            @jax.jit
            def _vel(params, x, t):
                return net.apply(
                    params,
                    x,
                    t,
                    compute_dtype=compute_dtype,
                    use_pallas=use_pallas,
                )

            self._velocity_jit = (key, _vel)
        x = _to_nhwc(x, data_format)
        t = jnp.asarray(t, jnp.float32)
        return _from_nhwc(self._velocity_jit[1](self.params, x, t), data_format)

    __call__ = forward

    def _get_sampler(
        self,
        num_steps: int,
        return_trajectory: bool,
        dtype,
        method: str = "euler",
        reverse: bool = False,
    ):
        key = (
            num_steps,
            bool(return_trajectory),
            jnp.dtype(dtype).name,
            method,
            bool(self.use_pallas),
            bool(reverse),
        )
        if key in self._sampler_cache:
            return self._sampler_cache[key]

        net = self.velocity_net
        use_pallas = self.use_pallas
        # forward integrates t: 0 -> 1; reverse runs the same ODE t: 1 -> 0
        # (used to invert real images into their coupled noise for
        # data-side Reflow pairs)
        dt = (-1.0 if reverse else 1.0) / num_steps

        def vel(cparams, x, t_scalar):
            t = jnp.full((x.shape[0],), t_scalar, jnp.float32)
            return net.apply(
                cparams,
                x.astype(dtype),
                t,
                compute_dtype=dtype,
                use_pallas=use_pallas,
            ).astype(jnp.float32)

        @jax.jit
        def sampler(params, noise):
            # Model compute in `dtype` (bf16 on TPU); integration state fp32.
            cparams = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
            x = noise.astype(jnp.float32)

            def step(x, i):
                # Left-endpoint times t_i = i/N forward (reference:
                # base_flow.py:163-166); t_i = 1 - i/N in reverse
                t0 = (1.0 if reverse else 0.0) + i * dt
                v = vel(cparams, x, t0)
                if method == "euler":
                    x = x + v * dt
                elif method == "midpoint":
                    x_mid = x + v * (dt / 2)
                    v_mid = vel(cparams, x_mid, t0 + dt / 2)
                    x = x + v_mid * dt
                elif method == "heun":
                    x_e = x + v * dt
                    v2 = vel(cparams, x_e, t0 + dt)
                    x = x + (v + v2) * (dt / 2)
                else:
                    raise ValueError(f"unknown method {method!r}")
                return x, (x if return_trajectory else None)

            x, traj = jax.lax.scan(
                step, x, jnp.arange(num_steps, dtype=jnp.float32)
            )
            return (x, traj) if return_trajectory else x

        self._sampler_cache[key] = sampler
        return sampler

    def sample(
        self,
        noise=None,
        num_steps: int = 100,
        batch_size: int = 1,
        return_trajectory: bool = False,
        *,
        rng: Optional[Array] = None,
        data_format: str = "NCHW",
        dtype: Optional[str] = None,
        method: str = "euler",
    ):
        """Generate samples by ODE integration (one fused scan).

        Mirrors reference semantics (base_flow.py:133-177): ``noise`` is
        [B, C, H, W] (or NHWC with data_format="NHWC") or None to draw
        ``batch_size`` fresh noise images; with ``return_trajectory`` the
        full state list [noise, x_1, ..., x_N] is returned.

        ``method``: "euler" (reference parity, 1 net eval/step), "midpoint"
        or "heun" (2nd order, 2 evals/step — better quality per step for the
        curved base-model ODE; the rectified model rarely needs them).
        """
        sample_dtype = _DTYPES[dtype] if dtype is not None else self.sample_dtype
        if noise is None:
            key = rng if rng is not None else self._split()
            noise_nhwc = jax.random.normal(
                key,
                (batch_size, self.image_size, self.image_size, self.in_channels),
                jnp.float32,
            )
        else:
            noise_nhwc = _to_nhwc(noise, data_format).astype(jnp.float32)

        sampler = self._get_sampler(
            num_steps, return_trajectory, sample_dtype, method
        )
        if return_trajectory:
            x, traj = sampler(self.params, noise_nhwc)
            states = [noise_nhwc] + [traj[i] for i in range(num_steps)]
            return [_from_nhwc(s, data_format) for s in states]
        x = sampler(self.params, noise_nhwc)
        return _from_nhwc(x, data_format)

    def invert(
        self,
        images,
        num_steps: int = 100,
        *,
        data_format: str = "NCHW",
        dtype: Optional[str] = None,
        method: str = "euler",
    ):
        """Integrate the flow ODE backward (t: 1 -> 0) from images to noise.

        The deterministic inverse of :meth:`sample` up to O(dt) integration
        error: for real images this recovers the noise the model couples
        them with, which is the data-side Reflow pair source ("Simple
        ReFlow", arXiv:2410.07815 — pairs whose x1 is REAL data rather than
        teacher samples, lifting the student's quality ceiling above the
        teacher's own sample quality). Same fused lax.scan executable shape
        as the forward sampler. No reference counterpart (the reference's
        pair synthesis is forward-only, rectified_flow.py:127-174).
        """
        sample_dtype = _DTYPES[dtype] if dtype is not None else self.sample_dtype
        x_nhwc = _to_nhwc(images, data_format).astype(jnp.float32)
        sampler = self._get_sampler(
            num_steps, False, sample_dtype, method, reverse=True
        )
        x0 = sampler(self.params, x_nhwc)
        return _from_nhwc(x0, data_format)

    def sample_with_trajectory(
        self,
        noise,
        num_steps: int = 100,
        save_every: int = 10,
        *,
        data_format: str = "NCHW",
    ) -> List[Array]:
        """Trajectory snapshots every ``save_every`` steps (reference:
        base_flow.py:179-208): [x_0, x_{save_every}, x_{2*save_every}, ...]."""
        states = self.sample(
            noise,
            num_steps=num_steps,
            return_trajectory=True,
            data_format=data_format,
        )
        return [states[0]] + [
            states[i] for i in range(save_every, num_steps + 1, save_every)
        ]

    # ---- checkpointing ------------------------------------------------------

    def save(self, path: str) -> None:
        """Save params + full architecture config to a single .npz file."""
        ckpt_io.save_params(path, self.params, self.config)

    def load(self, path: str) -> None:
        """Load params from .npz (native) or .pt (reference torch import)."""
        params, config = ckpt_io.load_params(path)
        own = jax.tree_util.tree_structure(self.params)
        new = jax.tree_util.tree_structure(params)
        if own != new:
            raise ValueError(
                f"checkpoint structure mismatch loading {path}: "
                f"expected {own}, got {new}"
            )
        mismatches = [
            f"{kp}: model {cur.shape} vs checkpoint {np.shape(new_)}"
            for kp, (cur, new_) in zip(
                (
                    jax.tree_util.keystr(k)
                    for k, _ in jax.tree_util.tree_flatten_with_path(self.params)[0]
                ),
                zip(
                    jax.tree_util.tree_leaves(self.params),
                    jax.tree_util.tree_leaves(params),
                ),
            )
            if tuple(cur.shape) != tuple(np.shape(new_))
        ]
        if mismatches:
            raise ValueError(
                f"checkpoint shape mismatch loading {path}: "
                + "; ".join(mismatches[:5])
                + (f" (+{len(mismatches) - 5} more)" if len(mismatches) > 5 else "")
            )
        self.params = jax.tree_util.tree_map(
            lambda cur, new_: jnp.asarray(new_, dtype=cur.dtype), self.params, params
        )
        print(f"Model loaded from: {path}")

    @classmethod
    def from_checkpoint(cls, path: str, **overrides):
        """Reconstruct a model purely from a self-describing checkpoint.

        The stored ``model_type`` dispatches to the right class, so loading
        a RectifiedFlowModel checkpoint through BaseFlowModel.from_checkpoint
        returns a RectifiedFlowModel (with its reflow_iteration restored).
        """
        params, config = ckpt_io.load_params(path)
        config = dict(config or {})
        model_type = config.pop("model_type", None)
        reflow_iteration = config.pop("reflow_iteration", None)
        config.update(overrides)

        target_cls = cls
        if model_type == "RectifiedFlowModel":
            from rectified_flow_vision_tpu.models.rectified_flow import (
                RectifiedFlowModel,
            )

            target_cls = RectifiedFlowModel
        model = target_cls(**config)
        if reflow_iteration is not None and hasattr(model, "reflow_iteration"):
            model.reflow_iteration = int(reflow_iteration)
        model.params = jax.tree_util.tree_map(jnp.asarray, params)
        return model


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------


def make_epoch_cosine_schedule(
    lr: float, epochs: int, steps_per_epoch: int, warmup_epochs: float = 0.0
):
    """Per-epoch cosine annealing, matching torch CosineAnnealingLR stepped
    once per epoch (reference: base_flow.py:252,281): epoch e uses
    lr * (1 + cos(pi * e / epochs)) / 2.

    ``warmup_epochs`` > 0 prepends a linear per-STEP ramp from 0 to the
    scheduled lr across that many epochs — a stability extension the
    reference lacks: the dit256 base run's Adam moments were corrupted by
    early-training spikes (round-3 measured divergence), exactly what
    warmup prevents.
    """

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        frac = jnp.minimum(epoch / epochs, 1.0)
        cos = 0.5 * lr * (1.0 + jnp.cos(jnp.pi * frac))
        if warmup_epochs <= 0:
            return cos
        ramp = jnp.minimum(
            (step + 1.0) / (warmup_epochs * max(steps_per_epoch, 1)), 1.0
        )
        return cos * ramp

    return schedule


def make_train_step(
    model: BaseFlowModel,
    tx,
    *,
    coupled: bool,
    ema_decay: Optional[float] = None,
    time_sampling: str = "uniform",
    pallas_dropout: Optional[bool] = None,
    pallas_mesh=None,
):
    """Build the single jitted, donated train step.

    loss -> grad -> global-norm clip (inside tx) -> optax update; gradient
    averaging across the data-parallel axis is implicit in sharded jit.
    With ``ema_decay``, an exponential moving average of the params is
    carried as an extra donated argument (production sampling weights; the
    reference has no EMA). ``pallas_mesh`` keeps the fused dropout kernel
    alive under a data-parallel mesh (shard_map over 'data').
    """

    if coupled:

        def loss(params, batch, rng):
            x0, x1 = batch
            return model.loss_fn(
                params, x1, rng, x0=x0, train=True,
                time_sampling=time_sampling, pallas_dropout=pallas_dropout,
                pallas_mesh=pallas_mesh,
            )

    else:

        def loss(params, batch, rng):
            return model.loss_fn(
                params, batch, rng, train=True,
                time_sampling=time_sampling, pallas_dropout=pallas_dropout,
                pallas_mesh=pallas_mesh,
            )

    if ema_decay is None:

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, batch, rng):
            loss_val, grads = jax.value_and_grad(loss)(params, batch, rng)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(
                lambda p, u: (p + u.astype(p.dtype)), params, updates
            )
            return params, opt_state, loss_val

        return train_step

    d = float(ema_decay)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step_ema(params, ema, opt_state, batch, rng):
        loss_val, grads = jax.value_and_grad(loss)(params, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(
            lambda p, u: (p + u.astype(p.dtype)), params, updates
        )
        ema = jax.tree_util.tree_map(
            lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), ema, params
        )
        return params, ema, opt_state, loss_val

    return train_step_ema


def make_train_epoch(
    model: BaseFlowModel,
    tx,
    *,
    coupled: bool,
    ema_decay: Optional[float] = None,
    time_sampling: str = "uniform",
    pallas_dropout: Optional[bool] = None,
    mesh=None,
    pallas_mesh=None,
):
    """Whole-epoch training as ONE jitted ``lax.scan`` over steps.

    The corpus lives on device; each scan step gathers its batch by index,
    so an epoch is a single dispatch with zero per-step host involvement.
    On this TPU tunnel the per-step host loop costs more than the step's
    compute (a 12 MB batch upload ~300 ms vs a 133 ms bf16 step), so this
    is the difference between ~540 and ~1900 img/s. Step math and RNG
    (``fold_in(epoch_key, i)``) are identical to ``make_train_step``, and
    the batch permutation is computed host-side exactly like
    ``ImageDataset.batches`` — the training trajectory is bit-compatible
    with the per-step path.

    Under ``mesh`` the corpus is device-resident REPLICATED and each scan
    step's gathered batch carries a sharding constraint over 'data', so
    DP/FSDP training keeps the one-dispatch-per-epoch path (round 2 fell
    back to the ~4x-slower per-step host loop the moment a mesh was
    passed). GSPMD partitions the whole scan body from that one
    constraint; ``pallas_mesh`` additionally keeps the fused dropout
    kernel alive per shard.
    """

    def step_loss(params, batch, rng):
        if coupled:
            x0, x1 = batch
            return model.loss_fn(
                params, x1, rng, x0=x0, train=True,
                time_sampling=time_sampling, pallas_dropout=pallas_dropout,
                pallas_mesh=pallas_mesh,
            )
        return model.loss_fn(
            params, batch, rng, train=True,
            time_sampling=time_sampling, pallas_dropout=pallas_dropout,
            pallas_mesh=pallas_mesh,
        )

    use_ema = ema_decay is not None
    d = float(ema_decay) if use_ema else 0.0

    batch_sharding = None
    if mesh is not None:
        from rectified_flow_vision_tpu.parallel import mesh as mesh_lib

        batch_sharding = mesh_lib.batch_sharding(mesh)

    def _constrain(b):
        if batch_sharding is None:
            return b
        return jax.lax.with_sharding_constraint(b, batch_sharding)

    def epoch_fn(params, ema, opt_state, corpus, perm, epoch_key):
        # corpus: [N,H,W,C] on device ((x0,x1) pair of those when coupled);
        # perm: [steps, B] int32 gather indices for every step of the epoch.
        def body(carry, inp):
            params, ema, opt_state = carry
            i, idx = inp
            if coupled:
                batch = (
                    _constrain(jnp.take(corpus[0], idx, axis=0)),
                    _constrain(jnp.take(corpus[1], idx, axis=0)),
                )
            else:
                batch = _constrain(jnp.take(corpus, idx, axis=0))
            rng = jax.random.fold_in(epoch_key, i)
            loss_val, grads = jax.value_and_grad(step_loss)(params, batch, rng)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(
                lambda p, u: (p + u.astype(p.dtype)), params, updates
            )
            if use_ema:
                ema = jax.tree_util.tree_map(
                    lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                    ema,
                    params,
                )
            return (params, ema, opt_state), loss_val

        steps = perm.shape[0]
        (params, ema, opt_state), losses = jax.lax.scan(
            body,
            (params, ema, opt_state),
            (jnp.arange(steps), perm),
        )
        return params, ema, opt_state, losses

    return jax.jit(epoch_fn, donate_argnums=(0, 1, 2))


# corpora larger than this stay on the host per-step path (the device
# epoch scan keeps the whole corpus in HBM)
DEVICE_EPOCH_MAX_BYTES = 2 * 1024**3


def _pallas_mesh_gate(mesh):
    """(pallas_dropout, pallas_mesh) for a trainer's mesh: data-parallel
    meshes keep the fused kernel through shard_map, TP meshes force the
    XLA chain, no mesh keeps the single-device auto gate.

    A one-device mesh skips shard_map entirely: the wrapper is pure
    overhead there (measured 21% on the device-epoch step, tools/
    bench_train.py --mode mesh) and the plain kernel is trajectory-
    identical — shard 0 folds ``axis_index=0`` into the seed."""
    if mesh is None:
        return None, None
    import math

    from rectified_flow_vision_tpu.parallel import mesh as mesh_lib

    if math.prod(mesh.shape.values()) == 1:
        return None, None
    if dict(mesh.shape).get(mesh_lib.MODEL_AXIS, 1) == 1:
        return None, mesh
    return False, None


def _effective_mesh(mesh):
    """None for one-device meshes: they are semantically identical to no
    mesh (same math, RNG streams, and batch permutations) but pay real
    partitioner overhead — measured 13% on the device-epoch train step
    even with the shard_map wrapper already skipped (2040 vs 1775 img/s,
    tools/bench_train.py --mode mesh). The trainers drop them; the
    low-level make_train_epoch/make_train_step still honor an explicit
    one-device mesh so that overhead stays measurable."""
    if mesh is None:
        return None
    import math

    return None if math.prod(mesh.shape.values()) == 1 else mesh


def make_optimizer(
    lr: float, epochs: int, steps_per_epoch: int, warmup_epochs: float = 0.0
):
    """AdamW (torch-default hyperparams) + epoch-cosine LR + grad clip 1.0."""
    import optax

    schedule = make_epoch_cosine_schedule(
        lr, epochs, steps_per_epoch, warmup_epochs
    )
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(
            schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01
        ),
    )


def train_base_flow(
    model: BaseFlowModel,
    dataloader,
    epochs: int = 50,
    lr: float = 1e-4,
    save_path: Optional[str] = None,
    save_every: int = 10,
    *,
    batch_size: Optional[int] = None,
    mesh=None,
    seed: int = 0,
    ckpt_ext: str = ".npz",
    progress: bool = True,
    resume_dir: Optional[str] = None,
    use_native_loader: bool = False,
    ema_decay: Optional[float] = None,
    device_epoch: Optional[bool] = None,
    fsdp: bool = False,
    warmup_epochs: float = 0.0,
) -> List[float]:
    """Train the base flow model (reference: base_flow.py:229-293).

    ``dataloader`` may be an ImageDataset (preferred: reshuffled per epoch
    with a per-epoch seed; requires ``batch_size``) or any re-iterable of
    NHWC numpy batches. Returns the per-epoch mean losses.

    With ``resume_dir``, the full train state (params + optimizer state +
    loss history) is checkpointed there asynchronously each ``save_every``
    epochs, and an interrupted run restarts from the latest state — a
    failure-recovery capability the reference lacks (save-only,
    base_flow.py:210-226).
    """
    from rectified_flow_vision_tpu.parallel import mesh as mesh_lib

    mesh = _effective_mesh(mesh)  # one-device meshes == no mesh, minus cost

    # GSPMD has no partitioning rule for pallas_call. On a pure data-
    # parallel (or FSDP) mesh the fused dropout kernel survives via a
    # shard_map over 'data' (ops/fused.py:_gn_silu_dropout_sharded); with
    # tensor parallelism the activations' channel dim is sharded and the
    # kernel stays off (XLA chain) — scoped to this trainer's train step.
    pallas_dropout, pallas_mesh = _pallas_mesh_gate(mesh)

    # dataset protocol (ImageDataset, PackedCorpus, ...): per-epoch
    # reshuffled fixed-shape batches + a known epoch length
    is_dataset = hasattr(dataloader, "batches") and hasattr(
        dataloader, "num_batches"
    )
    native = None
    if is_dataset:
        if batch_size is None:
            raise ValueError("batch_size is required when passing an ImageDataset")
        steps_per_epoch = dataloader.num_batches(batch_size)
        if use_native_loader:
            native = dataloader.native_loader(batch_size, seed=seed)
            if native is None:
                log.warning(
                    "native loader requested but unavailable "
                    "(build with tools/build_native.sh); using Python batches"
                )
            else:
                steps_per_epoch = native.batches_per_epoch
    else:
        # generic iterable: materialize once, then reshuffle the cached
        # batch list per epoch (seeded) to match the reference DataLoader's
        # shuffle=True semantics rather than replaying one fixed order
        probe = list(dataloader)
        dataloader = probe
        steps_per_epoch = len(probe)
    if steps_per_epoch == 0:
        raise ValueError("empty dataloader")

    tx = make_optimizer(lr, epochs, steps_per_epoch, warmup_epochs)
    params = model.params
    opt_state = tx.init(params)
    use_ema = ema_decay is not None and ema_decay > 0

    # Device-resident epoch scan (one dispatch per epoch, corpus in HBM):
    # the default on an accelerator when the corpus fits. Same step math,
    # RNG streams, and batch permutations as the per-step path.
    corpus_host = getattr(dataloader, "images", None) if is_dataset else None
    if device_epoch is None:
        device_epoch = (
            is_dataset
            and native is None
            and corpus_host is not None
            and 0 < len(dataloader)
            and corpus_host.nbytes <= DEVICE_EPOCH_MAX_BYTES
            and jax.default_backend() != "cpu"
            # mesh: the scan gathers per-step batches from a replicated
            # corpus and shards them over 'data' — needs divisibility
            and (mesh is None or batch_size % mesh.shape[mesh_lib.DATA_AXIS] == 0)
        )
    if device_epoch and corpus_host is None:
        raise ValueError("device_epoch=True needs a dataset with .images")
    train_epoch = None
    corpus_dev = None
    if device_epoch:
        corpus_dev = jnp.asarray(corpus_host)
        if mesh is not None:
            corpus_dev = jax.device_put(corpus_dev, mesh_lib.replicated(mesh))
        train_epoch = make_train_epoch(
            model, tx, coupled=False,
            ema_decay=ema_decay if use_ema else None,
            pallas_dropout=pallas_dropout,
            mesh=mesh, pallas_mesh=pallas_mesh,
        )
    train_step = make_train_step(
        model, tx, coupled=False,
        ema_decay=ema_decay if use_ema else None,
        pallas_dropout=pallas_dropout, pallas_mesh=pallas_mesh,
    )
    ema = None  # initialized after a possible restore (must not be fresh-init)

    # Placement: batch sharded over 'data'. Params/opt-state replicated for
    # plain DP(+TP), or fully sharded over 'data' under FSDP (ZeRO-style).
    params, opt_state = mesh_lib.place_train_state(
        mesh, params, opt_state, fsdp=fsdp
    )

    root_key = jax.random.key(seed)
    losses: List[float] = []
    start_epoch = 0

    state_mgr = None
    if resume_dir is not None:
        from rectified_flow_vision_tpu.utils.train_state import TrainStateManager

        state_mgr = TrainStateManager(resume_dir)
        restored = state_mgr.restore(params, opt_state)
        if restored is not None:
            params, opt_state, losses, start_epoch, ema = restored
            params = jax.tree_util.tree_map(jnp.asarray, params)
            opt_state = jax.tree_util.tree_map(jnp.asarray, opt_state)
            if ema is not None:
                ema = jax.tree_util.tree_map(jnp.asarray, ema)
            params, opt_state = mesh_lib.place_train_state(
                mesh, params, opt_state, fsdp=fsdp
            )
            if ema is not None:
                ema = mesh_lib.place_params(mesh, ema, fsdp=fsdp)
            log.info("Resumed training from epoch %d (%s)", start_epoch, resume_dir)

    if not use_ema:
        ema = None  # drop any EMA restored from an earlier ema_decay run
    if use_ema and ema is None:
        # fresh EMA only when there was nothing to restore: seeded from the
        # CURRENT (possibly restored) params, never a fresh init
        ema = jax.tree_util.tree_map(jnp.array, params)
        ema = mesh_lib.place_params(mesh, ema, fsdp=fsdp)

    for epoch in range(start_epoch, epochs):
        epoch_key = jax.random.fold_in(root_key, epoch)
        t0 = time.time()

        if device_epoch:
            # same permutation recipe as ImageDataset.batches
            n = len(dataloader)
            idx = np.arange(n)
            np.random.default_rng(seed * 100003 + epoch).shuffle(idx)
            if n < batch_size:
                idx = np.tile(idx, -(-batch_size // n))[:batch_size]
                n = batch_size
            end = n - (n % batch_size)
            perm = jnp.asarray(
                idx[:end].reshape(-1, batch_size), dtype=jnp.int32
            )
            if mesh is not None:
                perm = jax.device_put(perm, mesh_lib.replicated(mesh))
                epoch_key = jax.device_put(
                    epoch_key, mesh_lib.replicated(mesh)
                )
            params, ema, opt_state, step_losses = train_epoch(
                params, ema, opt_state, corpus_dev, perm, epoch_key
            )
            avg_loss = float(jnp.mean(step_losses))
        else:
            if is_dataset:
                batches = (
                    native.epoch(epoch)
                    if native is not None
                    else dataloader.batches(
                        batch_size, seed=seed * 100003 + epoch
                    )
                )
            else:
                perm = np.random.default_rng(
                    seed * 100003 + epoch
                ).permutation(len(dataloader))
                batches = [dataloader[j] for j in perm]

            epoch_losses = []
            for i, batch in enumerate(batches):
                step_key = jax.random.fold_in(epoch_key, i)
                batch = jnp.asarray(batch)
                if mesh is not None and batch.shape[0] % mesh.shape["data"] == 0:
                    batch = mesh_lib.shard_batch(mesh, batch)
                if use_ema:
                    params, ema, opt_state, loss_val = train_step(
                        params, ema, opt_state, batch, step_key
                    )
                else:
                    params, opt_state, loss_val = train_step(
                        params, opt_state, batch, step_key
                    )
                epoch_losses.append(loss_val)

            avg_loss = float(
                np.mean([jax.device_get(l) for l in epoch_losses])
            )
        losses.append(avg_loss)
        if progress:
            log.info(
                "Epoch %d/%d - Loss: %.4f (%.1fs)",
                epoch + 1,
                epochs,
                avg_loss,
                time.time() - t0,
            )

        model.params = params
        if save_path and (epoch + 1) % save_every == 0:
            model.save(f"{save_path}_epoch{epoch + 1}{ckpt_ext}")
            if use_ema:
                ckpt_io.save_params(
                    f"{save_path}_ema_epoch{epoch + 1}{ckpt_ext}", ema, model.config
                )
        if state_mgr is not None and (epoch + 1) % save_every == 0:
            state_mgr.save(epoch, params, opt_state, losses, ema=ema)

    model.params = params
    if save_path:
        model.save(f"{save_path}_final{ckpt_ext}")
        if use_ema:
            ckpt_io.save_params(f"{save_path}_ema_final{ckpt_ext}", ema, model.config)
    if state_mgr is not None:
        if epochs > start_epoch:
            state_mgr.save(epochs - 1, params, opt_state, losses, ema=ema)
        state_mgr.close()

    return losses


if __name__ == "__main__":
    # Smoke test (parity with reference models/base_flow.py:298-320)
    _model = BaseFlowModel(image_size=64, model_channels=64)
    print(f"Total parameters: {_model.num_parameters():,}")
    print("\nSampling test...")
    _samples = _model.sample(batch_size=4, num_steps=10)
    print(f"Sample shape: {tuple(_samples.shape)}")
    print("\nLoss test...")
    import numpy as _np

    _loss = _model.compute_loss(_np.random.randn(4, 3, 64, 64).astype(_np.float32))
    print(f"Loss: {float(_loss):.4f}")
