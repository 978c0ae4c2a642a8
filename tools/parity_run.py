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
     and runs the identical reduced-scale reflow;
  3. samples from the SAME noise tensors;
  4. computes FID (raw-pixel parity metric + SynthNet deep features) and
     SSIM for both implementations' samples against the corpus and writes
     results/parity/{REPORT.md, parity_metrics.csv, loss curves, grids}.

Usage: python tools/parity_run.py [--ref-out .parity_ref/out]
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

    # ---- 2. train ours on the identical corpus ----------------------------
    print("[parity] 2/4 training ours on the reference corpus", flush=True)
    ds = ImageDataset(str(ref / "corpus"), 64)
    model = BaseFlowModel(image_size=64)  # reference default architecture
    t0 = time.time()
    losses = train_base_flow(
        model, ds, epochs=50, lr=1e-4, batch_size=16, seed=42, progress=False
    )
    report["ours_base_train_s"] = round(time.time() - t0, 1)
    ref_losses = np.load(ref / "base_losses.npy")
    np.save(out / "ours_base_losses.npy", np.asarray(losses))
    report["base_loss_first_ours"] = round(losses[0], 4)
    report["base_loss_first_ref"] = round(float(ref_losses[0]), 4)
    report["base_loss_final_ours"] = round(losses[-1], 4)
    report["base_loss_final_ref"] = round(float(ref_losses[-1]), 4)

    # identical reduced-scale reflow
    x0, x1 = generate_reflow_pairs(
        model, num_pairs=256, batch_size=32, num_steps=50
    )
    rect = RectifiedFlowModel.from_base_model(model)
    rlosses = train_rectified_flow(
        rect, x0, x1, epochs=15, batch_size=16, lr=1e-4, progress=False
    )
    ref_rlosses = np.load(ref / "rect_losses.npy")
    np.save(out / "ours_rect_losses.npy", np.asarray(rlosses))
    report["rect_loss_final_ours"] = round(rlosses[-1], 4)
    report["rect_loss_final_ref"] = round(float(ref_rlosses[-1]), 4)

    # ---- 3. sample from the shared noise -----------------------------------
    print("[parity] 3/4 sampling from shared noise", flush=True)
    ours_base64 = np.concatenate(
        [
            np.asarray(
                model.sample(noise=jnp.asarray(noise[i : i + 32]), num_steps=64)
            )
            for i in range(0, 128, 32)
        ]
    )
    ours_rect4 = np.concatenate(
        [
            np.asarray(
                rect.sample(noise=jnp.asarray(noise[i : i + 32]), num_steps=4)
            )
            for i in range(0, 128, 32)
        ]
    )
    np.save(out / "ours_base_samples_64.npy", ours_base64)
    np.save(out / "ours_rect_samples_4.npy", ours_rect4)

    # ---- 4. metrics head-to-head -------------------------------------------
    print("[parity] 4/4 metrics", flush=True)
    calc = MetricsCalculator()
    corpus_nchw = np.transpose(ds.images, (0, 3, 1, 2))
    ref_base64 = np.load(ref / "base_samples_64.npy")
    ref_rect4 = np.load(ref / "rect_samples_4_full.npy")

    rows = []
    for label, ref_set, our_set in (
        ("base@64step", ref_base64, ours_base64),
        ("rect@4step", ref_rect4, ours_rect4),
    ):
        row = {"samples": label}
        for impl, s in (("ref", ref_set), ("ours", our_set)):
            s = np.clip(s, -1, 1)
            row[f"fid_pixel_{impl}"] = calc.compute_fid(corpus_nchw, s)
            row[f"fid_deep_{impl}"] = calc.compute_fid_deep(corpus_nchw, s)
            u8 = ((s.transpose(0, 2, 3, 1) + 1) / 2 * 255).astype(np.uint8)
            cu8 = ((ds.images + 1) / 2 * 255).astype(np.uint8)
            row[f"ssim_{impl}"] = float(
                np.mean(
                    [
                        calc.compute_ssim(cu8[i % len(cu8)], u8[i])
                        for i in range(64)
                    ]
                )
            )
        row["fid_pixel_delta_pct"] = round(
            100
            * (row["fid_pixel_ours"] - row["fid_pixel_ref"])
            / row["fid_pixel_ref"],
            2,
        )
        row["fid_deep_delta_pct"] = round(
            100
            * (row["fid_deep_ours"] - row["fid_deep_ref"])
            / row["fid_deep_ref"],
            2,
        )
        rows.append(row)

    import pandas as pd

    df = pd.DataFrame(rows)
    df.to_csv(out / "parity_metrics.csv", index=False)
    print(df.to_string(index=False))

    # loss-curve overlay + sample grids
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    axes[0].plot(ref_losses, label="reference (torch)")
    axes[0].plot(losses, label="ours (JAX/TPU)")
    axes[0].set_title("Base flow training loss (same corpus, 50 epochs)")
    axes[0].set_xlabel("epoch"), axes[0].legend(), axes[0].grid(alpha=0.3)
    axes[1].plot(ref_rlosses, label="reference (torch)")
    axes[1].plot(rlosses, label="ours (JAX/TPU)")
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
        "corpus images. Independently trained 11M-param models on 100",
        "images carry seed-level variance; the delta columns quantify it.",
        "",
        f"Training time, 50 epochs: reference {json.load(open(ref/'timings.json'))['base_train_50ep']:.0f}s"
        f" (1-core CPU) vs ours {report['ours_base_train_s']:.0f}s (1 TPU chip).",
    ]
    (out / "REPORT.md").write_text("\n".join(lines))
    print(f"[parity] report written to {out}/REPORT.md")


if __name__ == "__main__":
    main()
