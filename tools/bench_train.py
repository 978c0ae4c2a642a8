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


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--corpus", type=int, default=2048)
    p.add_argument("--epochs", type=int, default=3, help="timed epochs")
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

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
