"""Rectified Flow (Reflow) student model + the reflow training pipeline.

Capability parity with the reference (models/rectified_flow.py):

* ``RectifiedFlowModel`` — same architecture as the base model, trained on
  teacher-synthesized coupled pairs instead of (noise, real data)
  (reference: :29-124); fresh weights by default, matching the reference's
  deliberately-disabled weight copy (:77-78),
* ``generate_reflow_pairs`` — synthesize (noise, teacher-sample) pairs
  (:127-174),
* ``train_rectified_flow`` — flow-matching training on coupled pairs
  (:177-255),
* ``iterative_reflow`` — K rounds of student->teacher promotion with
  teacher-step halving, floor 10 (:258-318),
* ``compute_straightness`` — mean squared deviation of the rolled-out
  velocity from the constant ideal velocity x1-x0 (:82-124).

TPU-native design: pair synthesis runs fully on device — one compiled
teacher sampler is reused across fixed-shape batches (the reference syncs
to CPU per batch, rectified_flow.py:166-167); the straightness rollout is a
single ``lax.scan``.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rectified_flow_vision_tpu.models.base_flow import (
    DEVICE_EPOCH_MAX_BYTES,
    BaseFlowModel,
    _effective_mesh,
    _pallas_mesh_gate,
    _to_nhwc,
    make_optimizer,
    make_train_epoch,
    make_train_step,
)
from rectified_flow_vision_tpu.utils.logging_config import get_logger

Array = jax.Array
log = get_logger("flow_vision.models")


class RectifiedFlowModel(BaseFlowModel):
    """Reflow student: same flow model, trained on straightened couplings."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.reflow_iteration = 0

    @property
    def config(self) -> dict:
        cfg = super().config
        cfg["reflow_iteration"] = self.reflow_iteration
        return cfg

    @staticmethod
    def from_base_model(
        base_model: BaseFlowModel, *, copy_weights: bool = False, seed: int = 1
    ) -> "RectifiedFlowModel":
        """Fresh student with the teacher's architecture.

        ``copy_weights=False`` matches the reference default (the weight
        copy is deliberately commented out at rectified_flow.py:77-78).
        Works for any backbone (unet or dit).
        """
        cfg = dict(base_model.config)
        cfg.pop("model_type", None)
        cfg.pop("reflow_iteration", None)
        student = RectifiedFlowModel(
            seed=seed,
            compute_dtype=jnp.dtype(base_model.compute_dtype).name,
            sample_dtype=jnp.dtype(base_model.sample_dtype).name,
            **cfg,
        )
        if copy_weights:
            student.params = jax.tree_util.tree_map(
                jnp.array, base_model.params
            )
        return student

    def compute_straightness(
        self,
        x0,
        x1,
        num_points: int = 10,
        *,
        data_format: str = "NCHW",
    ) -> float:
        """Trajectory straightness: rollout deviation from constant v=x1-x0.

        0 would be perfectly straight. One jitted scan (reference runs a
        Python loop with a `.item()` sync per point, rectified_flow.py:104-122).
        """
        x0 = _to_nhwc(x0, data_format).astype(jnp.float32)
        x1 = _to_nhwc(x1, data_format).astype(jnp.float32)
        net = self.velocity_net
        dtype = self.sample_dtype
        use_pallas = self.use_pallas
        dt = 1.0 / num_points

        cache_key = ("straightness", num_points, jnp.dtype(dtype).name)
        if cache_key in self._sampler_cache:
            return float(self._sampler_cache[cache_key](self.params, x0, x1))

        @jax.jit
        def rollout(params, x0, x1):
            cparams = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
            ideal = x1 - x0

            def step(x, i):
                t = jnp.full((x.shape[0],), i * dt, jnp.float32)
                v = net.apply(
                    cparams, x.astype(dtype), t, compute_dtype=dtype,
                    use_pallas=use_pallas,
                ).astype(jnp.float32)
                dev = jnp.mean(jnp.square(v - ideal))
                return x + v * dt, dev

            _, devs = jax.lax.scan(step, x0, jnp.arange(num_points, dtype=jnp.float32))
            return jnp.mean(devs)

        self._sampler_cache[cache_key] = rollout
        return float(rollout(self.params, x0, x1))


# ---------------------------------------------------------------------------
# Reflow pipeline
# ---------------------------------------------------------------------------


def generate_reflow_pairs(
    teacher_model: BaseFlowModel,
    num_pairs: int,
    batch_size: int = 32,
    num_steps: int = 100,
    *,
    seed: int = 0,
    data_format: str = "NCHW",
    method: str = "euler",
    real_data=None,
    data_pair_fraction: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Synthesize (noise, image) couplings for Reflow training.

    Forward couplings (the reference's scheme, rectified_flow.py:127-174):
    draw x0 ~ N(0, I) and integrate the teacher ODE forward to x1. All
    batches share one compiled sampler executable (fixed shape); the final
    partial batch is padded to full shape and truncated on the host.

    Data-side couplings (``data_pair_fraction`` > 0, requires
    ``real_data``): take REAL images x1 and integrate the teacher ODE
    *backward* (:meth:`BaseFlowModel.invert`) to their coupled noise x0.
    The student then distils straight paths whose endpoints are real data
    — its quality ceiling becomes the data itself rather than the
    teacher's own samples ("Simple ReFlow", arXiv:2410.07815). Because
    inversion is deterministic, unique data pairs are bounded by the
    corpus size; mixing with forward pairs keeps the x0 marginal close to
    Gaussian. Returns numpy arrays of shape [num_pairs, ...] with the
    data-side pairs first.

    ``method`` selects the teacher's ODE integrator ("euler" = reference
    parity; "heun" gives 2nd-order targets from the curved base ODE at 2
    net evals/step — better couplings for the same step count).
    """
    num_data_pairs = 0
    if data_pair_fraction > 0.0:
        if real_data is None:
            raise ValueError("data_pair_fraction > 0 requires real_data")
        num_data_pairs = min(int(round(num_pairs * data_pair_fraction)), num_pairs)
    num_fwd_pairs = num_pairs - num_data_pairs

    key = jax.random.key(seed)
    log.info(
        "Generating %d pairs for Reflow (%d steps%s)...",
        num_pairs,
        num_steps,
        f", {num_data_pairs} data-side" if num_data_pairs else "",
    )

    x0_list, x1_list = [], []

    if num_data_pairs:
        data_nhwc = np.asarray(
            jax.device_get(_to_nhwc(real_data, data_format)), np.float32
        )
        # the inverse map is deterministic, so invert each unique image
        # once and tile when the corpus is smaller than the request
        n_unique = min(num_data_pairs, data_nhwc.shape[0])
        unique = data_nhwc[:n_unique]
        x0_unique_parts = []
        for start in range(0, n_unique, batch_size):
            x1 = unique[start : start + batch_size]
            pad = batch_size - x1.shape[0]
            x1_full = np.concatenate([x1, x1[:1].repeat(pad, 0)]) if pad else x1
            x0 = teacher_model.invert(
                x1_full, num_steps=num_steps, data_format="NHWC", method=method
            )
            x0_unique_parts.append(np.asarray(jax.device_get(x0))[: x1.shape[0]])
        x0_unique = np.concatenate(x0_unique_parts)
        idx = np.arange(num_data_pairs) % n_unique
        x0_list.append(x0_unique[idx])
        x1_list.append(unique[idx])

    num_batches = -(-num_fwd_pairs // batch_size) if num_fwd_pairs else 0
    for b in range(num_batches):
        bkey = jax.random.fold_in(key, b)
        x0 = jax.random.normal(
            bkey,
            (
                batch_size,
                teacher_model.image_size,
                teacher_model.image_size,
                teacher_model.in_channels,
            ),
            jnp.float32,
        )
        x1 = teacher_model.sample(
            noise=x0, num_steps=num_steps, data_format="NHWC", method=method
        )
        # sync per batch: bounds in-flight device work to one rollout (an
        # unbounded enqueue of ~40 multi-second sampler executions can wedge
        # remote-execution tunnels) and bounds host memory to 2 batches
        x0_list.append(np.asarray(jax.device_get(x0)))
        x1_list.append(np.asarray(jax.device_get(x1)))

    x0_all = np.concatenate(x0_list)[:num_pairs]
    x1_all = np.concatenate(x1_list)[:num_pairs]
    log.info("Generated %d pairs", x0_all.shape[0])

    if data_format.upper() == "NCHW":
        x0_all = np.transpose(x0_all, (0, 3, 1, 2))
        x1_all = np.transpose(x1_all, (0, 3, 1, 2))
    return x0_all, x1_all


def train_rectified_flow(
    model: RectifiedFlowModel,
    x0_data,
    x1_data,
    epochs: int = 30,
    batch_size: int = 16,
    lr: float = 1e-4,
    save_path: Optional[str] = None,
    save_every: int = 10,
    *,
    mesh=None,
    seed: int = 0,
    data_format: str = "NCHW",
    ckpt_ext: str = ".npz",
    progress: bool = True,
    resume_dir: Optional[str] = None,
    device_epoch: Optional[bool] = None,
    fsdp: bool = False,
    ema_decay: Optional[float] = None,
    time_sampling: str = "uniform",
) -> List[float]:
    """Train the student on pre-generated couplings (reference:
    rectified_flow.py:177-255): same AdamW/cosine/clip recipe as the base
    trainer, loss on (x0, x1) pairs with t ~ U[0,1] by default
    (``time_sampling`` selects logit_normal / u_shaped alternatives; with
    ``ema_decay`` an EMA of the student is carried and checkpointed as
    ``*_ema_*`` — the production sampling weights)."""
    from rectified_flow_vision_tpu.parallel import mesh as mesh_lib
    from rectified_flow_vision_tpu.utils import checkpoint as ckpt_io

    x0_data = np.asarray(jax.device_get(_to_nhwc(x0_data, data_format)))
    x1_data = np.asarray(jax.device_get(_to_nhwc(x1_data, data_format)))
    n = x0_data.shape[0]
    if n == 0:
        raise ValueError("no reflow pairs given")

    steps_per_epoch = max(n // batch_size, 1)
    tx = make_optimizer(lr, epochs, steps_per_epoch)
    params = model.params
    opt_state = tx.init(params)
    use_ema = ema_decay is not None and ema_decay > 0
    mesh = _effective_mesh(mesh)  # one-device meshes == no mesh, minus cost
    # data-parallel mesh keeps the fused dropout kernel via shard_map;
    # TP forces the XLA chain (same gate as train_base_flow)
    pallas_dropout, pallas_mesh = _pallas_mesh_gate(mesh)
    train_step = make_train_step(
        model, tx, coupled=True, pallas_dropout=pallas_dropout,
        pallas_mesh=pallas_mesh,
        ema_decay=ema_decay if use_ema else None, time_sampling=time_sampling,
    )

    # Device-resident epoch scan (one dispatch per epoch, pair corpus in
    # HBM) — same win as train_base_flow's: on the TPU tunnel the per-step
    # batch uploads dominate the step compute. Identical RNG streams and
    # batch permutations as the per-step loop below, so the training
    # trajectory is bit-compatible.
    if device_epoch is None:
        device_epoch = (
            jax.default_backend() != "cpu"
            and x0_data.nbytes + x1_data.nbytes <= DEVICE_EPOCH_MAX_BYTES
            and (
                mesh is None
                or batch_size % mesh.shape[mesh_lib.DATA_AXIS] == 0
            )
        )
    train_epoch = None
    corpus_dev = None
    if device_epoch:
        corpus_dev = (jnp.asarray(x0_data), jnp.asarray(x1_data))
        if mesh is not None:
            corpus_dev = jax.device_put(
                corpus_dev, mesh_lib.replicated(mesh)
            )
        train_epoch = make_train_epoch(
            model, tx, coupled=True, pallas_dropout=pallas_dropout,
            ema_decay=ema_decay if use_ema else None,
            time_sampling=time_sampling,
            mesh=mesh, pallas_mesh=pallas_mesh,
        )

    params, opt_state = mesh_lib.place_train_state(
        mesh, params, opt_state, fsdp=fsdp
    )

    root_key = jax.random.key(seed)
    losses: List[float] = []
    start_epoch = 0
    ema = None
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
            log.info("Resumed reflow training from epoch %d", start_epoch)

    if not use_ema:
        ema = None
    if use_ema and ema is None:
        # seeded from the CURRENT (possibly restored) params
        ema = jax.tree_util.tree_map(jnp.array, params)
        ema = mesh_lib.place_params(mesh, ema, fsdp=fsdp)

    import time as _time

    for epoch in range(start_epoch, epochs):
        order = np.random.default_rng(seed * 99991 + epoch).permutation(n)
        epoch_key = jax.random.fold_in(root_key, epoch)

        t0 = _time.time()
        # fixed-shape batches; a too-small corpus is tiled up to one batch
        if n < batch_size:
            order = np.tile(order, -(-batch_size // n))[:batch_size]
        end = max(len(order) - (len(order) % batch_size), batch_size)

        if device_epoch:
            perm = jnp.asarray(
                order[:end].reshape(-1, batch_size), dtype=jnp.int32
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
            epoch_losses = []
            for i, start in enumerate(range(0, end, batch_size)):
                idx = order[start : start + batch_size]
                batch = (jnp.asarray(x0_data[idx]), jnp.asarray(x1_data[idx]))
                if mesh is not None and batch_size % mesh.shape["data"] == 0:
                    batch = tuple(mesh_lib.shard_batch(mesh, b) for b in batch)
                step_key = jax.random.fold_in(epoch_key, i)
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
                "Reflow Epoch %d/%d - Loss: %.4f (%.1fs)",
                epoch + 1,
                epochs,
                avg_loss,
                _time.time() - t0,
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
            ckpt_io.save_params(
                f"{save_path}_ema_final{ckpt_ext}", ema, model.config
            )
    if state_mgr is not None:
        if epochs > start_epoch:
            state_mgr.save(epochs - 1, params, opt_state, losses, ema=ema)
        state_mgr.close()

    return losses


def iterative_reflow(
    initial_model: BaseFlowModel,
    real_data_loader=None,
    num_iterations: int = 2,
    epochs_per_iter: int = 30,
    num_pairs: int = 5000,
    teacher_steps: int = 100,
    lr: float = 1e-4,
    save_dir: Optional[str] = None,
    *,
    pair_batch_size: int = 32,
    batch_size: int = 16,
    seed: int = 0,
    mesh=None,
    fsdp: bool = False,
    init_from_teacher: bool = False,
    teacher_method: str = "euler",
    time_sampling: str = "uniform",
    ema_decay: Optional[float] = None,
    real_data=None,
    data_pair_fraction: float = 0.0,
) -> List[RectifiedFlowModel]:
    """Reflow-K: iteratively re-straighten (reference: rectified_flow.py:258-318).

    Each round: student from the current teacher -> synthesize pairs
    from the teacher -> train student -> student becomes teacher; the
    teacher's sampling steps halve each round (floor 10).
    ``real_data_loader`` is accepted for signature parity (the reference
    takes but never uses it beyond reference purposes).

    ``init_from_teacher`` starts each student at the teacher's weights (the
    original Rectified Flow recipe; the reference comments this copy out,
    rectified_flow.py:77-78). With ``ema_decay`` each round also rolls an
    EMA of the student; the EMA weights become the NEXT round's teacher
    (and the returned model's params) — the committed-recipe quality path.
    """
    models: List[RectifiedFlowModel] = []
    current_teacher = initial_model

    for k in range(num_iterations):
        log.info("=" * 60)
        log.info("REFLOW ITERATION %d/%d", k + 1, num_iterations)
        log.info("=" * 60)

        student = RectifiedFlowModel.from_base_model(
            current_teacher, seed=seed + 1000 * (k + 1),
            copy_weights=init_from_teacher,
        )
        student.reflow_iteration = k + 1

        x0_data, x1_data = generate_reflow_pairs(
            current_teacher,
            num_pairs=num_pairs,
            batch_size=pair_batch_size,
            num_steps=teacher_steps,
            seed=seed + k,
            data_format="NHWC",
            method=teacher_method,
            real_data=real_data,
            data_pair_fraction=data_pair_fraction,
        )

        save_path = f"{save_dir}/reflow_k{k + 1}" if save_dir else None
        train_rectified_flow(
            student,
            x0_data,
            x1_data,
            epochs=epochs_per_iter,
            batch_size=batch_size,
            lr=lr,
            save_path=save_path,
            seed=seed + k,
            data_format="NHWC",
            mesh=mesh,
            fsdp=fsdp,
            ema_decay=ema_decay,
            time_sampling=time_sampling,
        )
        if ema_decay is not None and ema_decay > 0 and save_path:
            # promote the EMA weights: they are both the returned model's
            # params and the next round's teacher
            from rectified_flow_vision_tpu.utils import checkpoint as ckpt_io

            ema_params, _ = ckpt_io.load_params(f"{save_path}_ema_final.npz")
            student.params = jax.tree_util.tree_map(jnp.asarray, ema_params)

        models.append(student)
        current_teacher = student
        teacher_steps = max(teacher_steps // 2, 10)

    return models


if __name__ == "__main__":
    # Smoke test (parity with reference models/rectified_flow.py:321-343)
    _base = BaseFlowModel(image_size=64)
    _rect = RectifiedFlowModel.from_base_model(_base)
    print(f"Rectified model created with {_rect.num_parameters():,} parameters")
    print("\nPair generation test...")
    _x0, _x1 = generate_reflow_pairs(_base, num_pairs=10, num_steps=10)
    print(f"x0 shape: {_x0.shape}, x1 shape: {_x1.shape}")
    print("\nStraightness test...")
    _s = _rect.compute_straightness(_x0[:2], _x1[:2])
    print(f"Straightness (untrained): {_s:.4f}")
