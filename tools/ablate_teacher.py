#!/usr/bin/env python
"""Train ONE base-model (teacher) arm and judge it (r5 ask #5).

The cifar32q gap (rect@8 13.1 vs base@100 10.25 under the r4 honest
methodology) may be a TEACHER problem: the student is capped near its
teacher's sample distribution, so the lever to measure is whether a
better base model — longer schedule, larger synthetic corpus — moves
base@100 fid_deep down and pulls the distilled student with it.

This driver trains one base arm with explicit overrides and evaluates
it under the EXACT committed eval (held-out n=1000 refs, v2 backbone,
bootstrap CIs), appending one JSON line per arm. A winning arm is
promoted by updating the config and re-running the full pipeline via
tools/queue_r5.sh.

Usage:
  python tools/ablate_teacher.py --name ep600 \
      --config configs/config_cifar32q.yaml \
      [--epochs N] [--corpus-dir DIR --corpus-n N] [--steps 64 100]
      [--out FILE]

Unset overrides inherit the committed config. The trained arm's EMA
checkpoint stays in /tmp/teacher_arm_<name>/ so a follow-up student can
distill from it (tools/ablate_flagship_levers.py --teacher PATH).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", required=True)
    ap.add_argument("--config", default="configs/config_cifar32q.yaml")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--corpus-dir", default=None,
                    help="train on this image dir instead of the config's")
    ap.add_argument("--corpus-n", type=int, default=None,
                    help="generate this many synthetic images into "
                         "--corpus-dir if it has fewer")
    ap.add_argument("--steps", nargs="+", type=int, default=[64, 100])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import numpy as np

    from rectified_flow_vision_tpu.config import load_config, repo_root
    from rectified_flow_vision_tpu.data import ImageDataset, eval_reference_images
    from rectified_flow_vision_tpu.experiments.benchmark import benchmark_quality
    from rectified_flow_vision_tpu.experiments.train_base import build_model
    from rectified_flow_vision_tpu.models import BaseFlowModel, train_base_flow
    from rectified_flow_vision_tpu.utils import MetricsCalculator
    from rectified_flow_vision_tpu.utils import checkpoint as ckpt_io

    cfg = load_config(args.config)
    tb = cfg.training_base
    epochs = args.epochs or tb.epochs
    lr = args.lr or tb.learning_rate
    batch_size = args.batch_size or tb.batch_size

    corpus_dir = args.corpus_dir or str(repo_root() / cfg.data.data_dir)
    if args.corpus_dir and args.corpus_n:
        from rectified_flow_vision_tpu.utils.download_data import (
            generate_synthetic_images,
        )

        d = Path(corpus_dir)
        d.mkdir(parents=True, exist_ok=True)
        have = len(list(d.glob("*.png")))
        if have < args.corpus_n:
            print(f"generating {args.corpus_n - have} corpus images "
                  f"into {d}", flush=True)
            generate_synthetic_images(
                str(d), num_images=args.corpus_n, size=cfg.data.image_size
            )

    ds = ImageDataset(corpus_dir, cfg.data.image_size)
    print(f"corpus: {corpus_dir} ({len(ds)} images)", flush=True)

    model = build_model(cfg, BaseFlowModel)
    scratch = Path(f"/tmp/teacher_arm_{args.name}")
    scratch.mkdir(parents=True, exist_ok=True)

    t0 = time.time()
    train_base_flow(
        model,
        ds,
        epochs=epochs,
        lr=lr,
        batch_size=batch_size,
        save_path=str(scratch / "base_flow"),
        save_every=10**9,
        ema_decay=tb.ema_decay or None,
        progress=False,
    )
    t_train = time.time() - t0
    ema_path = scratch / "base_flow_ema_final.npz"
    if ema_path.exists():
        ema_params, _ = ckpt_io.load_params(str(ema_path))
        model.params = jax.tree_util.tree_map(np.asarray, ema_params)

    ref_imgs = eval_reference_images(
        cfg.data.image_size, cfg.benchmark.quality_samples
    )
    calc = MetricsCalculator()
    row = {
        "arm": args.name,
        "epochs": epochs,
        "lr": lr,
        "batch_size": batch_size,
        "corpus_n": len(ds),
        "train_s": round(t_train, 1),
    }
    for steps in args.steps:
        q = benchmark_quality(model, ref_imgs, steps, calc=calc)
        row[f"fid_deep@{steps}"] = round(q["fid_deep"], 3)
        row[f"fid_ci@{steps}"] = [
            round(q["fid_deep_lo"], 3), round(q["fid_deep_hi"], 3),
        ]
        row[f"ssim@{steps}"] = round(q["ssim_mean"], 4)
    row["n_eval"] = int(ref_imgs.shape[0])
    print(json.dumps(row), flush=True)
    if args.out:
        with open(args.out, "a") as fh:
            fh.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
