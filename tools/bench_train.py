#!/usr/bin/env python
"""Training-throughput benchmark: img/s through train_base_flow.

Prints one JSON line per configuration. Uses the device-resident epoch
scan (one dispatch per epoch) with a synthetic corpus, timing whole
epochs after a warmup epoch — exactly what a user's training run sees.
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def bench_loaders(args) -> None:
    """A/B the host batch pipelines: Python batches vs the C++ prefetching
    loader (csrc/databatch.cpp) feeding the SAME jitted train step, plus
    the device-resident epoch scan as the ceiling. One JSON line each."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from rectified_flow_vision_tpu.data import ImageDataset
    from rectified_flow_vision_tpu.models import BaseFlowModel
    from rectified_flow_vision_tpu.models.base_flow import (
        make_optimizer,
        make_train_epoch,
        make_train_step,
    )
    from rectified_flow_vision_tpu.utils.download_data import (
        generate_synthetic_images,
    )

    tmp = tempfile.mkdtemp(prefix="rfv_loader_bench_")
    generate_synthetic_images(tmp, args.corpus, args.size)
    ds = ImageDataset(tmp, args.size)
    steps = ds.num_batches(args.batch)

    model = BaseFlowModel(image_size=args.size, compute_dtype=args.dtype)
    tx = make_optimizer(1e-4, 10, steps)

    def run(batches_per_epoch, label):
        # fresh buffers each run: the jitted step donates params/opt, so
        # reusing model.params across runs would hit deleted arrays
        params = jax.tree_util.tree_map(jnp.array, model.params)
        opt = tx.init(params)
        step = make_train_step(model, tx, coupled=False)
        # warmup epoch compiles + fills the prefetch ring
        for i, b in enumerate(batches_per_epoch(0)):
            params, opt, loss = step(params, opt, jnp.asarray(b), jax.random.key(i))
        float(loss)
        t0 = time.perf_counter()
        for e in range(1, args.epochs + 1):
            for i, b in enumerate(batches_per_epoch(e)):
                params, opt, loss = step(
                    params, opt, jnp.asarray(b), jax.random.key(e * 1000 + i)
                )
        float(loss)  # sync the chain
        dt = (time.perf_counter() - t0) / args.epochs
        print(
            json.dumps(
                {
                    "metric": f"train_img_per_sec_{label}_{args.size}x{args.size}_b{args.batch}",
                    "value": round(steps * args.batch / dt, 1),
                    "unit": "images/sec/chip",
                    "ms_per_step": round(dt / steps * 1000, 2),
                }
            ),
            flush=True,
        )

    run(lambda e: ds.batches(args.batch, seed=e), "python_loop")
    native = ds.native_loader(args.batch, seed=0)
    if native is None:
        print(json.dumps({"metric": "native_loader", "value": None,
                          "note": "lib not built"}))
    else:
        run(lambda e: native.epoch(e), "native_loop")

    # ceiling: the device-resident epoch scan over the same corpus
    params = jax.tree_util.tree_map(jnp.array, model.params)
    opt = tx.init(params)
    train_epoch = make_train_epoch(model, tx, coupled=False)
    corpus = jnp.asarray(ds.images)
    rng = np.random.default_rng(0)
    perm = jnp.asarray(
        rng.permutation(len(ds))[: steps * args.batch].reshape(steps, args.batch),
        dtype=jnp.int32,
    )
    ema = None
    params, ema, opt, losses = train_epoch(params, ema, opt, corpus, perm, jax.random.key(0))
    float(losses[-1])
    t0 = time.perf_counter()
    for e in range(args.epochs):
        params, ema, opt, losses = train_epoch(
            params, ema, opt, corpus, perm, jax.random.key(e + 1)
        )
    float(losses[-1])
    dt = (time.perf_counter() - t0) / args.epochs
    print(
        json.dumps(
            {
                "metric": f"train_img_per_sec_device_epoch_{args.size}x{args.size}_b{args.batch}",
                "value": round(steps * args.batch / dt, 1),
                "unit": "images/sec/chip",
                "ms_per_step": round(dt / steps * 1000, 2),
            }
        ),
        flush=True,
    )


def bench_mesh(args) -> None:
    """Device-epoch scan WITH a mesh vs without: the round-3 fix makes
    mesh training keep the one-dispatch-per-epoch path (round 2 fell back
    to the per-step host loop under any mesh). On a single chip the mesh
    is 1x1 — the delta is pure partitioner overhead. Timed on the
    low-level make_train_epoch (warmup epoch, then timed epochs) with the
    same placement as train_base_flow, so compile time never pollutes the
    measurement."""
    import jax
    import jax.numpy as jnp

    from rectified_flow_vision_tpu.models import BaseFlowModel
    from rectified_flow_vision_tpu.models.base_flow import (
        _pallas_mesh_gate,
        make_optimizer,
        make_train_epoch,
    )
    from rectified_flow_vision_tpu.parallel import mesh as mesh_lib

    rng = np.random.default_rng(0)
    imgs = rng.uniform(-1, 1, (args.corpus, args.size, args.size, 3)).astype(
        np.float32
    )
    steps = args.corpus // args.batch
    perm_host = rng.permutation(args.corpus)[: steps * args.batch].reshape(
        steps, args.batch
    )

    for label, mesh in [("single", None), ("mesh1x1", mesh_lib.create_mesh())]:
        model = BaseFlowModel(image_size=args.size, compute_dtype=args.dtype)
        tx = make_optimizer(1e-4, args.epochs + 1, steps)
        pallas_dropout, pallas_mesh = _pallas_mesh_gate(mesh)
        train_epoch = make_train_epoch(
            model, tx, coupled=False, pallas_dropout=pallas_dropout,
            mesh=mesh, pallas_mesh=pallas_mesh,
        )
        params = jax.tree_util.tree_map(jnp.array, model.params)
        opt = tx.init(params)
        params, opt = mesh_lib.place_train_state(mesh, params, opt)
        corpus = jnp.asarray(imgs)
        perm = jnp.asarray(perm_host, dtype=jnp.int32)
        if mesh is not None:
            corpus = jax.device_put(corpus, mesh_lib.replicated(mesh))
            perm = jax.device_put(perm, mesh_lib.replicated(mesh))

        def key(e):
            k = jax.random.key(e)
            return (
                jax.device_put(k, mesh_lib.replicated(mesh))
                if mesh is not None
                else k
            )

        ema = None
        params, ema, opt, losses = train_epoch(
            params, ema, opt, corpus, perm, key(0)
        )
        float(losses[-1])  # warmup epoch: compile + first run
        t0 = time.perf_counter()
        for e in range(args.epochs):
            params, ema, opt, losses = train_epoch(
                params, ema, opt, corpus, perm, key(e + 1)
            )
        float(losses[-1])
        per_epoch = (time.perf_counter() - t0) / args.epochs
        print(
            json.dumps(
                {
                    "metric": f"train_img_per_sec_device_epoch_{label}",
                    "value": round(steps * args.batch / per_epoch, 1),
                    "unit": "images/sec/chip",
                    "ms_per_step": round(per_epoch / steps * 1000, 2),
                }
            ),
            flush=True,
        )


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--corpus", type=int, default=2048)
    p.add_argument("--epochs", type=int, default=3, help="timed epochs")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument(
        "--mode", choices=["epoch", "loaders", "mesh"], default="epoch",
        help="epoch: device-epoch throughput (headline); loaders: python "
        "vs native C++ host pipelines A/B; mesh: mesh vs single device-epoch",
    )
    args = p.parse_args()

    if args.mode == "loaders":
        bench_loaders(args)
        return
    if args.mode == "mesh":
        bench_mesh(args)
        return

    import jax

    from rectified_flow_vision_tpu.models import BaseFlowModel
    from rectified_flow_vision_tpu.models.base_flow import (
        make_optimizer,
        make_train_epoch,
    )

    model = BaseFlowModel(image_size=args.size, compute_dtype=args.dtype)
    tx = make_optimizer(1e-4, 10, args.corpus // args.batch)
    params, opt = model.params, None
    opt = tx.init(params)
    train_epoch = make_train_epoch(model, tx, coupled=False)

    rng = np.random.default_rng(0)
    corpus = jax.numpy.asarray(
        rng.uniform(-1, 1, (args.corpus, args.size, args.size, 3)).astype(
            np.float32
        )
    )
    steps = args.corpus // args.batch
    perm = jax.numpy.asarray(
        rng.permutation(args.corpus)[: steps * args.batch].reshape(
            steps, args.batch
        ),
        dtype=jax.numpy.int32,
    )

    # warmup epoch (compiles the scan)
    ema = None
    params, ema, opt, losses = train_epoch(
        params, ema, opt, corpus, perm, jax.random.key(0)
    )
    float(losses[-1])

    t0 = time.perf_counter()
    for e in range(args.epochs):
        params, ema, opt, losses = train_epoch(
            params, ema, opt, corpus, perm, jax.random.key(e + 1)
        )
    float(losses[-1])  # sync through the dependency chain
    dt = (time.perf_counter() - t0) / args.epochs

    img_per_sec = args.corpus / dt
    print(
        json.dumps(
            {
                "metric": f"train_img_per_sec_{args.size}x{args.size}_b{args.batch}_{args.dtype}",
                "value": round(img_per_sec, 1),
                "unit": "images/sec/chip",
                "ms_per_step": round(dt / steps * 1000, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
