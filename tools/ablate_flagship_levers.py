#!/usr/bin/env python
"""Train ONE flagship distillation-lever arm and judge it (r5 ask #2).

The round-4 honest methodology left the flagship claim failing its FID
clause: rect@4 fid_deep 13.0 [11.9, 14.4] vs base@100 11.5 [10.3, 12.8]
(needs <= 1.10x anchor = 12.68). The measured-positive lever from the r3
pair-count ablation is MORE PAIRS; untried levers are a longer student
schedule and more/higher-order teacher steps at synthesis. This driver
trains one arm of the committed recipe with explicit overrides and
evaluates it under the EXACT committed eval (held-out n=1000 refs, v2
backbone, bootstrap CIs), appending one JSON line per arm so each lever
is either adopted or committed as measured-and-rejected.

Usage:
  python tools/ablate_flagship_levers.py --name pairs64k \
      [--pairs N] [--epochs N] [--teacher-steps N] [--method heun]
      [--config configs/config.yaml] [--steps 1 2 4 8] [--out FILE]

Unset overrides inherit the committed config recipe. The trained arm's
EMA checkpoint stays in /tmp/flagship_arm_<name>/ for promotion: a
winning arm is re-landed by updating the config and re-running
train_rectified + benchmark through tools/queue_r5.sh flagship.
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
    ap.add_argument("--config", default="configs/config.yaml")
    ap.add_argument("--pairs", type=int, default=None)
    ap.add_argument("--pair-batch", type=int, default=None,
                    help="synthesis batch size (default: config "
                         "pair_batch_size; larger batches amortize the "
                         "axon tunnel's per-dispatch overhead)")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--teacher-steps", type=int, default=None)
    ap.add_argument("--method", default=None, help="euler|heun")
    ap.add_argument("--steps", nargs="+", type=int, default=[1, 2, 4])
    ap.add_argument("--teacher", default=None,
                    help="teacher checkpoint (.npz) overriding the "
                         "config's base_flow_ema_final — lets a "
                         "tools/ablate_teacher.py arm feed distillation")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import numpy as np

    from rectified_flow_vision_tpu.config import load_config, repo_root
    from rectified_flow_vision_tpu.data import eval_reference_images
    from rectified_flow_vision_tpu.experiments.benchmark import (
        benchmark_quality,
    )
    from rectified_flow_vision_tpu.experiments.train_base import build_model
    from rectified_flow_vision_tpu.models import (
        BaseFlowModel,
        RectifiedFlowModel,
        generate_reflow_pairs,
        train_rectified_flow,
    )
    from rectified_flow_vision_tpu.utils import checkpoint as ckpt_io

    cfg = load_config(args.config)
    tr = cfg.training_rectified
    pairs = args.pairs or tr.num_pairs
    epochs = args.epochs or tr.epochs
    teacher_steps = args.teacher_steps or tr.teacher_steps
    method = args.method or tr.teacher_method
    ckpt_dir = repo_root() / cfg.paths.checkpoints

    teacher = build_model(cfg, BaseFlowModel)
    teacher_path = (
        Path(args.teacher) if args.teacher
        else ckpt_dir / "base_flow_ema_final.npz"
    )
    teacher.load(str(teacher_path))
    print(f"teacher: {teacher_path}", flush=True)

    scratch = Path(f"/tmp/flagship_arm_{args.name}")
    scratch.mkdir(parents=True, exist_ok=True)

    t0 = time.time()
    x0, x1 = generate_reflow_pairs(
        teacher,
        num_pairs=pairs,
        batch_size=args.pair_batch or tr.pair_batch_size,
        num_steps=teacher_steps,
        data_format="NHWC",
        method=method,
    )
    t_synth = time.time() - t0

    student = RectifiedFlowModel.from_base_model(
        teacher, copy_weights=tr.init_from_teacher
    )
    t0 = time.time()
    train_rectified_flow(
        student,
        x0,
        x1,
        epochs=epochs,
        batch_size=tr.batch_size,
        lr=tr.learning_rate,
        save_path=str(scratch / "rect"),
        save_every=10**9,
        data_format="NHWC",
        ema_decay=tr.ema_decay or None,
        time_sampling=tr.time_sampling,
    )
    t_train = time.time() - t0
    ema_params, _ = ckpt_io.load_params(str(scratch / "rect_ema_final.npz"))
    student.params = jax.tree_util.tree_map(np.asarray, ema_params)

    ref_imgs = eval_reference_images(
        cfg.data.image_size, cfg.benchmark.quality_samples
    )
    from rectified_flow_vision_tpu.utils import MetricsCalculator

    calc = MetricsCalculator()
    row = {
        "arm": args.name,
        "teacher": str(teacher_path),
        "num_pairs": pairs,
        "epochs": epochs,
        "teacher_steps": teacher_steps,
        "method": method,
        "synth_s": round(t_synth, 1),
        "train_s": round(t_train, 1),
    }
    for steps in args.steps:
        q = benchmark_quality(student, ref_imgs, steps, calc=calc)
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
