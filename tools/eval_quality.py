#!/usr/bin/env python
"""Judge any flow checkpoint under the committed quality methodology.

Loads a .npz flow checkpoint (base or rectified/reflow student) for a
config and evaluates it against the held-out eval references with the
same code path as the committed artifacts (experiments/benchmark.py::
benchmark_quality — v2 backbone, n=quality_samples, bootstrap FID +
precision/recall CIs). One JSON line per (checkpoint, steps) pair.

This is the measurement half of the round-5 flagship lever hunt
(VERDICT r5 ask #2): candidate students (K=2 reflow, more-pairs arms,
longer schedules) are judged under the EXACT eval that judges the
committed claim, so a winning arm's number is directly comparable to
results/quality_results.csv.

Usage:
  python tools/eval_quality.py CKPT.npz [CKPT2.npz ...]
      [--config YAML] [--steps 1 2 4 8] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpts", nargs="+", help=".npz flow checkpoints")
    ap.add_argument("--config", default="configs/config.yaml")
    ap.add_argument("--steps", nargs="+", type=int, default=[1, 2, 4])
    ap.add_argument("--out", default=None,
                    help="also append one JSON line per row to this file")
    args = ap.parse_args()

    from rectified_flow_vision_tpu.config import load_config
    from rectified_flow_vision_tpu.data import eval_reference_images
    from rectified_flow_vision_tpu.experiments.benchmark import (
        benchmark_quality,
    )
    from rectified_flow_vision_tpu.experiments.train_base import build_model
    from rectified_flow_vision_tpu.models import BaseFlowModel
    from rectified_flow_vision_tpu.utils import MetricsCalculator

    cfg = load_config(args.config)
    ref_imgs = eval_reference_images(
        cfg.data.image_size, cfg.benchmark.quality_samples
    )
    calc = MetricsCalculator()

    for ckpt in args.ckpts:
        model = build_model(cfg, BaseFlowModel)
        model.load(ckpt)
        for steps in args.steps:
            q = benchmark_quality(model, ref_imgs, steps, calc=calc)
            row = {
                "ckpt": ckpt,
                "steps": steps,
                "fid_deep": round(q["fid_deep"], 3),
                "fid_ci": [round(q["fid_deep_lo"], 3),
                           round(q["fid_deep_hi"], 3)],
                "ssim": round(q["ssim_mean"], 4),
                "lpips_to_ref": round(q["lpips_to_ref"], 6),
                "lpips_recall": round(q["lpips_recall"], 6),
                "n_eval": int(ref_imgs.shape[0]),
            }
            print(json.dumps(row), flush=True)
            if args.out:
                with open(args.out, "a") as fh:
                    fh.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
