"""Ablate the data-side Reflow coupling fraction on the cifar32q recipe.

Reuses the trained cifar32q EMA base as teacher; for each requested
``data_pair_fraction`` arm, trains a student with the committed recipe
(32k pairs, heun@100, teacher-init, u-shaped t, EMA 0.999, 300 epochs)
where the given fraction of pairs couple REAL corpus images with their
ODE-inverted noise (BaseFlowModel.invert), and evaluates deep-feature
FID at 1/2/4/8 steps against the corpus — the same metric and anchor the
committed quality artifacts use (results/cifar32q/quality_results.csv:
base@100 fid_deep 3.62).

Usage: python tools/ablate_datapairs.py [--fractions 0.5 0.25]
            [--epochs N] [--pairs N] [--out FILE]
--epochs / --pairs override the config's student schedule and pair count
(shorter paired ablations; the reported JSON rows record the overrides
actually used), --out additionally appends each arm's JSON line to FILE.
Writes per-arm checkpoints under /tmp/ablate_dp_<frac>/ and prints one
JSON line per arm.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fractions", nargs="+", type=float, default=[0.5])
    ap.add_argument("--config", default="configs/config_cifar32q.yaml")
    ap.add_argument("--steps", nargs="+", type=int, default=[1, 2, 4, 8])
    ap.add_argument("--epochs", type=int, default=None,
                    help="override student epochs (shorter paired ablations)")
    ap.add_argument("--pairs", type=int, default=None,
                    help="override num_pairs")
    ap.add_argument("--out", default=None,
                    help="also append one JSON line per arm to this file")
    ap.add_argument("--anchor", action="store_true",
                    help="also emit a base-teacher@100 anchor row (re-run "
                    "whenever the metric backbone or reference set changes)")
    args = ap.parse_args()

    import jax
    import numpy as np

    from rectified_flow_vision_tpu.config import load_config, repo_root
    from rectified_flow_vision_tpu.data import ImageDataset
    from rectified_flow_vision_tpu.experiments.benchmark import benchmark_quality
    from rectified_flow_vision_tpu.models import (
        BaseFlowModel,
        RectifiedFlowModel,
        generate_reflow_pairs,
        train_rectified_flow,
    )
    from rectified_flow_vision_tpu.utils import checkpoint as ckpt_io

    cfg = load_config(args.config)
    tr = cfg.training_rectified
    epochs = args.epochs if args.epochs is not None else tr.epochs
    num_pairs = args.pairs if args.pairs is not None else tr.num_pairs
    ckpt_dir = repo_root() / cfg.paths.checkpoints
    teacher = BaseFlowModel(
        image_size=cfg.data.image_size,
        model_channels=cfg.model.channels,
        channel_mult=cfg.model.channel_mult,
        num_res_blocks=cfg.model.num_res_blocks,
        dropout=cfg.model.dropout,
        sample_dtype=cfg.model.sample_dtype,
    )
    teacher_path = ckpt_dir / "base_flow_ema_final.npz"
    teacher.load(str(teacher_path))
    print(f"teacher: {teacher_path}", flush=True)

    ds = ImageDataset(str(repo_root() / cfg.data.data_dir), cfg.data.image_size)
    corpus = ds.images  # NHWC [-1, 1]
    # held-out references + shared calculator: same methodology as the
    # committed benchmark artifacts (heldout_reference / n>=1000 / CI)
    from rectified_flow_vision_tpu.data import eval_reference_images
    from rectified_flow_vision_tpu.utils import MetricsCalculator

    ref_imgs = eval_reference_images(
        cfg.data.image_size, cfg.benchmark.quality_samples
    )
    calc = MetricsCalculator()

    def q_row(model, row):
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

    if args.anchor:
        q = benchmark_quality(teacher, ref_imgs, 100, calc=calc)
        q_row_data = {
            "data_pair_fraction": None, "model": "base_teacher@100",
            "fid_deep@100": round(q["fid_deep"], 3),
            "fid_ci@100": [
                round(q["fid_deep_lo"], 3), round(q["fid_deep_hi"], 3),
            ],
            "ssim@100": round(q["ssim_mean"], 4),
            "n_eval": int(ref_imgs.shape[0]),
        }
        print(json.dumps(q_row_data), flush=True)
        if args.out:
            with open(args.out, "a") as fh:
                fh.write(json.dumps(q_row_data) + "\n")

    for frac in args.fractions:
        scratch = Path(f"/tmp/ablate_dp_{frac}")
        scratch.mkdir(parents=True, exist_ok=True)
        x0, x1 = generate_reflow_pairs(
            teacher,
            num_pairs=num_pairs,
            batch_size=tr.pair_batch_size,
            num_steps=tr.teacher_steps,
            data_format="NHWC",
            method=tr.teacher_method,
            real_data=corpus,
            data_pair_fraction=frac,
        )
        student = RectifiedFlowModel.from_base_model(teacher, copy_weights=True)
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
        ema_params, _ = ckpt_io.load_params(str(scratch / "rect_ema_final.npz"))
        student.params = jax.tree_util.tree_map(np.asarray, ema_params)

        row = {"data_pair_fraction": frac, "epochs": epochs, "num_pairs": num_pairs}
        q_row(student, row)


if __name__ == "__main__":
    main()
