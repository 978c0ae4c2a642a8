"""Unit tests for the benchmark's quality-claim heuristic.

The reference prints its rect@<=4 ~ base@64+ claim unconditionally
(reference: experiments/benchmark.py:287-306); our harness judges it on
measured quality rows (learned-feature FID preferred). These tests pin
the judging rules so committed reports can't silently claim support.
"""

import math

from rectified_flow_vision_tpu.experiments.benchmark import judge_quality_claim


def _row(model, steps, fid_deep=float("nan"), fid_simple=100.0, ssim=0.5):
    return {
        "model": model,
        "num_steps": steps,
        "fid_deep": fid_deep,
        "fid_simple": fid_simple,
        "ssim_mean": ssim,
    }


def test_supported_on_fid_deep_within_10pct():
    rows = [
        _row("base", 100, fid_deep=14.0, ssim=0.47),
        _row("rectified", 1, fid_deep=15.5, ssim=0.40),
        _row("rectified", 4, fid_deep=13.3, ssim=0.40),
    ]
    supported, col, best, anchor = judge_quality_claim(rows)
    assert supported is True
    assert col == "fid_deep"
    assert best["num_steps"] == 4  # the best few-step row wins
    assert anchor["num_steps"] == 100


def test_not_supported_when_fid_gap_large_and_ssim_worse():
    rows = [
        _row("base", 64, fid_deep=10.0, ssim=0.60),
        _row("rectified", 4, fid_deep=20.0, ssim=0.30),
    ]
    supported, col, best, _ = judge_quality_claim(rows)
    assert supported is False
    assert col == "fid_deep"


def test_ssim_rescues_within_margin():
    # FID misses the 10% window but SSIM is within 0.02 of the anchor.
    rows = [
        _row("base", 64, fid_deep=10.0, ssim=0.50),
        _row("rectified", 2, fid_deep=12.0, ssim=0.49),
    ]
    supported, _, _, _ = judge_quality_claim(rows)
    assert supported is True


def test_falls_back_to_fid_simple_when_deep_is_nan():
    rows = [
        _row("base", 100, fid_deep=float("nan"), fid_simple=800.0),
        _row("rectified", 1, fid_deep=float("nan"), fid_simple=750.0),
    ]
    supported, col, _, _ = judge_quality_claim(rows)
    assert col == "fid_simple"
    assert supported is True


def test_no_judgement_without_anchor_or_few_step_rows():
    # no many-step base anchor
    supported, col, best, anchor = judge_quality_claim(
        [_row("base", 8), _row("rectified", 4, fid_deep=1.0)]
    )
    assert supported is None and anchor is None
    # no few-step rectified rows
    supported, _, best, anchor = judge_quality_claim(
        [_row("base", 100, fid_deep=5.0), _row("rectified", 8, fid_deep=1.0)]
    )
    assert supported is None and best is None
    assert anchor is not None and math.isfinite(anchor["fid_deep"])


class TestUntrainedOverwriteGuard:
    """Benchmark must not clobber committed artifacts with random weights
    (model .npz checkpoints are untracked; a fresh checkout has none)."""

    def _touch(self, d):
        (d / "quality_results.csv").write_text("x")
        (d / "benchmark_results.csv").write_text("x")

    def test_raises_on_untrained_with_existing_artifacts(self, tmp_path):
        from rectified_flow_vision_tpu.experiments.benchmark import (
            guard_untrained_overwrite,
        )

        self._touch(tmp_path)
        import pytest

        with pytest.raises(SystemExit, match="UNTRAINED"):
            guard_untrained_overwrite(["base"], tmp_path, allow=False)

    def test_allows_when_trained_or_overridden_or_fresh(self, tmp_path):
        from rectified_flow_vision_tpu.experiments.benchmark import (
            guard_untrained_overwrite,
        )

        # trained models: fine even with artifacts present
        self._touch(tmp_path)
        guard_untrained_overwrite([], tmp_path, allow=False)
        # explicit override
        guard_untrained_overwrite(["base", "rectified"], tmp_path, allow=True)
        # no artifacts to destroy (fresh results dir)
        fresh = tmp_path / "fresh"
        fresh.mkdir()
        guard_untrained_overwrite(["base"], fresh, allow=False)


def test_conclusions_quality_verdict_survives_short_timing_sweep():
    """The timing sweep may stop short of the quality anchor's step count
    (dit256 times 1-32 steps, anchors quality at base@64): the claim line
    must still be emitted, only the total-speedup figure omitted."""
    from rectified_flow_vision_tpu.experiments.benchmark import (
        conclusion_lines_for,
    )

    quality = [
        _row("base", 64, fid_deep=46.3, ssim=0.51),
        _row("rectified", 4, fid_deep=15.6, ssim=0.31),
    ]
    timing = [
        {"num_steps": s, "time_per_image": s * 1e-3, "images_per_second": 1000 / s}
        for s in (1, 2, 4, 8, 16, 32)
    ]
    lines = conclusion_lines_for(quality, timing, timing)
    joined = "\n".join(lines)
    assert "matches the quality" in joined
    assert "total speedup" not in joined
    assert "Peak few-step throughput" in joined


def test_conclusions_full_run_has_speedup():
    from rectified_flow_vision_tpu.experiments.benchmark import (
        conclusion_lines_for,
    )

    quality = [
        _row("base", 100, fid_deep=13.9, ssim=0.47),
        _row("rectified", 4, fid_deep=13.3, ssim=0.47),
    ]
    timing = [
        {"num_steps": s, "time_per_image": s * 1e-3, "images_per_second": 1000 / s}
        for s in (1, 2, 4, 8, 16, 32, 64, 100)
    ]
    lines = conclusion_lines_for(quality, timing, timing)
    joined = "\n".join(lines)
    assert "matches the quality" in joined
    # speedup anchors at the FIRST >=64-step timing row (64) vs rect@1
    assert "Measured total speedup: 64.0x faster" in joined


def test_claim_basis_distinguishes_fid_from_ssim_rescue():
    """An SSIM-margin-only verdict must be qualified in the report text;
    an FID-window verdict stays unqualified."""
    from rectified_flow_vision_tpu.experiments.benchmark import (
        conclusion_lines_for,
        judge_quality_claim,
    )

    timing = [
        {"num_steps": s, "time_per_image": s * 1e-3, "images_per_second": 1000 / s}
        for s in (1, 4, 100)
    ]
    # FID within 10%: basis == fid, no qualifier
    fid_rows = [
        _row("base", 100, fid_deep=14.0, ssim=0.47),
        _row("rectified", 4, fid_deep=13.3, ssim=0.47),
    ]
    _, _, best, _ = judge_quality_claim(fid_rows)
    assert best["basis"] == "fid"
    assert "(measured above)" in "\n".join(
        conclusion_lines_for(fid_rows, timing, timing)
    )
    # SSIM rescue only: basis == ssim, qualified wording
    ssim_rows = [
        _row("base", 100, fid_deep=4.7, ssim=0.190),
        _row("rectified", 1, fid_deep=7.5, ssim=0.176),
    ]
    _, _, best, _ = judge_quality_claim(ssim_rows)
    assert best["basis"] == "ssim"
    joined = "\n".join(conclusion_lines_for(ssim_rows, timing, timing))
    assert "SSIM margin" in joined and "FID gap remains" in joined
