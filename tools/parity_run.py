#!/usr/bin/env python
"""Head-to-head parity run — JAX/TPU side + comparison report.

Counterpart of the PyTorch-reference driver (run against a pristine copy
of /root/reference with only its one-character SyntaxError fixed, see
SURVEY.md §0). The reference side produced, on a seeded synthetic corpus:
50-epoch base training at reference defaults, 128 base samples @ 64 Euler
steps from saved noise, a reduced-scale reflow (256 pairs @ 50 teacher
steps, 15 epochs — this host has one CPU core), few-step grids, trained
checkpoints, and velocity-field probes.

This script:
  1. imports the reference's trained base/rect .pt checkpoints through
     utils/pt_import.py and asserts velocity-field agreement on fixed
     inputs (the framework computes the same function);
  2. trains OUR base model on the identical corpus (same epochs/batch/lr)
     and runs the identical reduced-scale reflow — once per --seeds entry,
     so the FID-delta columns carry a measured per-seed spread (round-5
     ask #7: the "FID within 2%" clause needs uncertainty attached);
  3. samples from the SAME noise tensors;
  4. computes FID (raw-pixel parity metric + SynthNet deep features) and
     SSIM for both implementations' samples against the corpus and writes
     results/parity/{REPORT.md, parity_metrics.csv, loss curves, grids}.

Usage: python tools/parity_run.py [--ref-out .parity_ref/out]
                                  [--seeds 42 43 44]
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-out", default=".parity_ref/out")
    ap.add_argument("--results", default="results/parity")
    ap.add_argument(
        "--seeds", nargs="+", type=int, default=[42, 43, 44],
        help="train ours once per seed; deltas get a per-seed spread",
    )
    args = ap.parse_args()
    ref = Path(args.ref_out)
    out = Path(args.results)
    out.mkdir(parents=True, exist_ok=True)

    import jax
    import jax.numpy as jnp

    from rectified_flow_vision_tpu.data import ImageDataset
    from rectified_flow_vision_tpu.models import (
        BaseFlowModel,
        RectifiedFlowModel,
        generate_reflow_pairs,
        train_base_flow,
        train_rectified_flow,
    )
    from rectified_flow_vision_tpu.utils.metrics import MetricsCalculator
    from rectified_flow_vision_tpu.utils.pt_import import import_pt_checkpoint

    noise = np.load(ref / "noise_128.npy")  # [128,3,64,64] NCHW

    report = {}

    # ---- 1. velocity-field agreement through the .pt importer -------------
    print("[parity] 1/4 velocity-field agreement via pt import", flush=True)
    for name in ("base", "rect"):
        params, config = import_pt_checkpoint(ref / f"{name}_final.pt")
        cls = BaseFlowModel if name == "base" else RectifiedFlowModel
        m = cls(
            image_size=int(config.get("image_size", 64)),
            in_channels=int(config.get("in_channels", 3)),
            params=params,
            compute_dtype="float32",
            sample_dtype="float32",
        )
        probe = np.load(ref / f"{name}_velocity_probe.npy")  # [5,8,3,64,64]
        x = jnp.asarray(noise[:8])
        errs = []
        # HIGHEST: TPU fp32 matmuls/convs otherwise run as bf16 passes,
        # which would measure MXU rounding, not import fidelity
        with jax.default_matmul_precision("highest"):
            for i, tv in enumerate((0.0, 0.25, 0.5, 0.75, 1.0)):
                v = np.asarray(m.forward(x, jnp.full((8,), tv)))
                err = np.max(np.abs(v - probe[i]))
                scale = np.max(np.abs(probe[i]))
                errs.append(err / max(scale, 1e-6))
        rel = float(np.max(errs))
        report[f"{name}_velocity_max_rel_err"] = rel
        print(f"    {name}: max rel err {rel:.2e}")
        assert rel < 5e-4, f"velocity mismatch for {name}: {rel}"

    # ---- 2+3. train ours on the identical corpus, once per seed ------------
    ds = ImageDataset(str(ref / "corpus"), 64)
    ref_losses = np.load(ref / "base_losses.npy")
    ref_rlosses = np.load(ref / "rect_losses.npy")
    report["base_loss_first_ref"] = round(float(ref_losses[0]), 4)
    report["base_loss_final_ref"] = round(float(ref_losses[-1]), 4)
    report["rect_loss_final_ref"] = round(float(ref_rlosses[-1]), 4)
    report["seeds"] = list(args.seeds)

    def _sample(m, steps):
        return np.concatenate(
            [
                np.asarray(
                    m.sample(
                        noise=jnp.asarray(noise[i : i + 32]), num_steps=steps
                    )
                )
                for i in range(0, 128, 32)
            ]
        )

    per_seed = []
    for si, seed in enumerate(args.seeds):
        print(
            f"[parity] 2/4 training ours (seed {seed},"
            f" {si + 1}/{len(args.seeds)})",
            flush=True,
        )
        model = BaseFlowModel(image_size=64, seed=seed)  # reference default arch
        t0 = time.time()
        losses = train_base_flow(
            model, ds, epochs=50, lr=1e-4, batch_size=16, seed=seed,
            progress=False,
        )
        train_s = round(time.time() - t0, 1)
        # identical reduced-scale reflow
        x0, x1 = generate_reflow_pairs(
            model, num_pairs=256, batch_size=32, num_steps=50, seed=seed
        )
        rect = RectifiedFlowModel.from_base_model(model, seed=seed + 1)
        rlosses = train_rectified_flow(
            rect, x0, x1, epochs=15, batch_size=16, lr=1e-4, seed=seed,
            progress=False,
        )
        print(f"[parity] 3/4 sampling from shared noise (seed {seed})",
              flush=True)
        per_seed.append(
            dict(
                seed=seed, train_s=train_s, losses=losses, rlosses=rlosses,
                base64=_sample(model, 64), rect4=_sample(rect, 4),
            )
        )

    first = per_seed[0]
    report["ours_base_train_s"] = first["train_s"]
    report["base_loss_first_ours"] = round(first["losses"][0], 4)
    report["base_loss_final_ours"] = round(first["losses"][-1], 4)
    report["rect_loss_final_ours"] = round(first["rlosses"][-1], 4)
    np.save(out / "ours_base_losses.npy", np.asarray(first["losses"]))
    np.save(out / "ours_rect_losses.npy", np.asarray(first["rlosses"]))
    np.save(out / "ours_base_samples_64.npy", first["base64"])
    np.save(out / "ours_rect_samples_4.npy", first["rect4"])
    ours_base64, ours_rect4 = first["base64"], first["rect4"]
    losses, rlosses = first["losses"], first["rlosses"]

    # ---- 4. metrics head-to-head -------------------------------------------
    print("[parity] 4/4 metrics", flush=True)
    calc = MetricsCalculator()
    corpus_nchw = np.transpose(ds.images, (0, 3, 1, 2))
    ref_base64 = np.load(ref / "base_samples_64.npy")
    ref_rect4 = np.load(ref / "rect_samples_4_full.npy")
    cu8 = ((ds.images + 1) / 2 * 255).astype(np.uint8)

    def _metrics(s):
        s = np.clip(s, -1, 1)
        u8 = ((s.transpose(0, 2, 3, 1) + 1) / 2 * 255).astype(np.uint8)
        return (
            calc.compute_fid(corpus_nchw, s),
            calc.compute_fid_deep(corpus_nchw, s),
            float(
                np.mean(
                    [
                        calc.compute_ssim(cu8[i % len(cu8)], u8[i])
                        for i in range(64)
                    ]
                )
            ),
        )

    ref_vals = {
        "base@64step": _metrics(ref_base64),
        "rect@4step": _metrics(ref_rect4),
    }
    rows = []
    for ps in per_seed:
        for label, our_set in (
            ("base@64step", ps["base64"]),
            ("rect@4step", ps["rect4"]),
        ):
            rfp, rfd, rss = ref_vals[label]
            ofp, ofd, oss = _metrics(our_set)
            rows.append(
                {
                    "samples": label,
                    "seed": ps["seed"],
                    "fid_pixel_ref": rfp,
                    "fid_deep_ref": rfd,
                    "ssim_ref": rss,
                    "fid_pixel_ours": ofp,
                    "fid_deep_ours": ofd,
                    "ssim_ours": oss,
                    "fid_pixel_delta_pct": round(100 * (ofp - rfp) / rfp, 2),
                    "fid_deep_delta_pct": round(100 * (ofd - rfd) / rfd, 2),
                }
            )

    import pandas as pd

    df = pd.DataFrame(rows)
    df.to_csv(out / "parity_metrics.csv", index=False)
    print(df.to_string(index=False))

    # per-seed spread of the deep-FID delta (the north-star "within 2%" clause)
    spread = {}
    for label in ("base@64step", "rect@4step"):
        d = df[df["samples"] == label]["fid_deep_delta_pct"]
        spread[label] = dict(
            mean=round(float(d.mean()), 2),
            lo=round(float(d.min()), 2),
            hi=round(float(d.max()), 2),
        )
    report["fid_deep_delta_spread"] = spread

    # loss-curve overlay + sample grids
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    axes[0].plot(ref_losses, label="reference (torch)")
    for ps in per_seed:
        axes[0].plot(ps["losses"], label=f"ours (JAX/TPU, seed {ps['seed']})")
    axes[0].set_title("Base flow training loss (same corpus, 50 epochs)")
    axes[0].set_xlabel("epoch"), axes[0].legend(), axes[0].grid(alpha=0.3)
    axes[1].plot(ref_rlosses, label="reference (torch)")
    for ps in per_seed:
        axes[1].plot(ps["rlosses"], label=f"ours (JAX/TPU, seed {ps['seed']})")
    axes[1].set_title("Rectified training loss (256 pairs, 15 epochs)")
    axes[1].set_xlabel("epoch"), axes[1].legend(), axes[1].grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out / "loss_curves.png", dpi=110)

    def grid(ax, imgs, title):
        tiles = [
            np.clip((imgs[i].transpose(1, 2, 0) + 1) / 2, 0, 1)
            for i in range(8)
        ]
        ax.imshow(
            np.concatenate(
                [np.concatenate(tiles[:4], 1), np.concatenate(tiles[4:], 1)], 0
            )
        )
        ax.set_title(title, fontsize=9)
        ax.axis("off")

    fig, axes = plt.subplots(2, 2, figsize=(10, 6))
    grid(axes[0][0], ref_base64, "reference base @64 steps")
    grid(axes[0][1], ours_base64, "ours base @64 steps (same noise)")
    grid(axes[1][0], ref_rect4, "reference rectified @4 steps")
    grid(axes[1][1], ours_rect4, "ours rectified @4 steps (same noise)")
    fig.tight_layout()
    fig.savefig(out / "sample_grids.png", dpi=110)

    with open(out / "report.json", "w") as f:
        json.dump(report, f, indent=1)

    lines = [
        "# Quality parity: PyTorch reference vs this framework",
        "",
        "Protocol: the pristine reference (one-char SyntaxError fixed) ran",
        "end-to-end on a seeded synthetic corpus (100 images, the exact",
        "recipe of reference utils/download_data.py) on this host's CPU;",
        "ours trained on the identical corpus on one TPU chip. Base stage",
        "at full reference defaults (50 epochs, batch 16, lr 1e-4); reflow",
        "at an identical reduced scale on both sides (256 pairs @ 50",
        "teacher steps, 15 epochs; the host has ONE CPU core and the",
        "reference needs ~8 h at its default reflow scale). Sampling used",
        "the same stored noise for both implementations.",
        "",
        "## 1. The framework computes the same function",
        "",
        "The reference's trained checkpoints imported through",
        "`utils/pt_import.py` reproduce its velocity fields on fixed",
        f"inputs: max rel err base {report['base_velocity_max_rel_err']:.2e},",
        f"rect {report['rect_velocity_max_rel_err']:.2e}.",
        "",
        "## 2. Training dynamics",
        "",
        f"| curve | reference | ours |",
        f"|---|---|---|",
        f"| base loss epoch 1 | {report['base_loss_first_ref']} | {report['base_loss_first_ours']} |",
        f"| base loss epoch 50 | {report['base_loss_final_ref']} | {report['base_loss_final_ours']} |",
        f"| rect loss epoch 15 | {report['rect_loss_final_ref']} | {report['rect_loss_final_ours']} |",
        "",
        "(`loss_curves.png` overlays the full curves.)",
        "",
        "## 3. Sample quality (same noise, metrics vs the training corpus)",
        "",
        df.to_markdown(index=False),
        "",
        "fid_pixel = the reference's raw-pixel FID (score-parity metric);",
        "fid_deep = SynthNet learned-feature FID; ssim = mean SSIM against",
        "corpus images. One independently trained 11M-param model per seed",
        "on 100 images; the reference row is its single (seeded) run.",
        "",
        "## 4. Seed spread of the deep-FID delta",
        "",
        f"Across seeds {report['seeds']} (ours retrained end-to-end per",
        "seed, reference fixed):",
        "",
        "| samples | delta mean | delta range |",
        "|---|---|---|",
        f"| base@64step | {spread['base@64step']['mean']:+.2f}% "
        f"| [{spread['base@64step']['lo']:+.2f}%, "
        f"{spread['base@64step']['hi']:+.2f}%] |",
        f"| rect@4step | {spread['rect@4step']['mean']:+.2f}% "
        f"| [{spread['rect@4step']['lo']:+.2f}%, "
        f"{spread['rect@4step']['hi']:+.2f}%] |",
        "",
        "The north-star clause is \"FID within 2% of the PyTorch",
        "reference\". The spread above is the measured seed-level noise",
        "floor of that comparison: deltas inside (or ranges overlapping)",
        "the spread are indistinguishable from retraining the same",
        "implementation with a different seed.",
        "",
        f"Training time, 50 epochs: reference {json.load(open(ref/'timings.json'))['base_train_50ep']:.0f}s"
        f" (1-core CPU) vs ours {report['ours_base_train_s']:.0f}s (1 TPU chip).",
    ]
    (out / "REPORT.md").write_text("\n".join(lines))
    print(f"[parity] report written to {out}/REPORT.md")


if __name__ == "__main__":
    main()
