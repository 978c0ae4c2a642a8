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
    # the speedup figure pairs the SAME rows that carried the quality
    # claim: rect@4 (4ms) vs base@100 (100ms) = 25x — NOT rect@1 vs
    # base@64 (ADVICE r4: the old pairing overstated it ~2x)
    assert "Measured quality-matched speedup: 25.0x" in joined
    assert "rect@4 vs base@100" in joined


def test_degenerate_anchor_is_replaced_by_best_base_row():
    """VERDICT r4 ask #3: when the base model's many-step output is its
    WORST (dit256's base@64 fid 46.3 vs base@4 15.1), the claim must be
    judged against base's best measured row, with disclosure."""
    from rectified_flow_vision_tpu.experiments.benchmark import (
        conclusion_lines_for,
    )

    quality = [
        _row("base", 1, fid_deep=15.1, ssim=0.60),
        _row("base", 4, fid_deep=14.8, ssim=0.60),
        _row("base", 64, fid_deep=46.3, ssim=0.51),
        _row("rectified", 4, fid_deep=15.6, ssim=0.62),
    ]
    supported, col, best, anchor = judge_quality_claim(quality)
    assert anchor["num_steps"] == 4  # base's best row, not the @64 anchor
    assert anchor["degraded_from_steps"] == 64
    # rect@4 15.6 <= 1.10 * 14.8: supported against the HONEST anchor
    assert supported is True
    timing = [
        {"num_steps": s, "time_per_image": s * 1e-3, "images_per_second": 1000 / s}
        for s in (1, 2, 4, 8, 16, 32, 64)
    ]
    joined = "\n".join(conclusion_lines_for(quality, timing, timing))
    assert "base quality DEGRADES with steps" in joined
    # speedup pairs the judged rows (rect@4 vs base@4): 1x, honestly
    assert "rect@4 vs base@4" in joined


def test_healthy_anchor_not_replaced_by_noise():
    """A base row beating the anchor within noise (overlapping CIs /
    <2% relative) must NOT trigger the anchor substitution."""
    rows = [
        _row("base", 4, fid_deep=13.85),
        _row("base", 100, fid_deep=14.0),
        _row("rectified", 4, fid_deep=13.3),
    ]
    _, _, _, anchor = judge_quality_claim(rows)
    assert anchor["num_steps"] == 100
    assert "degraded_from_steps" not in anchor


def test_disagreement_requires_both_directions_beyond_noise():
    """VERDICT r4 ask #6 / ADVICE r4: a 1e-5 lpips_to_ref delta is a tie,
    not a 'disagreement'; the disclosure fires only when both metrics
    support opposite directions beyond noise."""
    from rectified_flow_vision_tpu.experiments.benchmark import (
        conclusion_lines_for,
    )

    timing = [
        {"num_steps": s, "time_per_image": s * 1e-3, "images_per_second": 1000 / s}
        for s in (1, 4, 100)
    ]

    def rows(prec_rect, prec_base, rect_ci=None, base_ci=None):
        b = _row("base", 100, fid_deep=11.5, ssim=0.47)
        r = _row("rectified", 4, fid_deep=13.0, ssim=0.47)
        b.update(lpips_to_ref=prec_base, fid_deep_lo=10.3, fid_deep_hi=12.8)
        r.update(lpips_to_ref=prec_rect, fid_deep_lo=11.9, fid_deep_hi=14.4)
        if rect_ci:
            r.update(lpips_to_ref_lo=rect_ci[0], lpips_to_ref_hi=rect_ci[1])
        if base_ci:
            b.update(lpips_to_ref_lo=base_ci[0], lpips_to_ref_hi=base_ci[1])
        return [b, r]

    # flagship r4 case: fid CIs OVERLAP and the precision delta is 1.1e-5
    # -> neither direction is beyond noise -> no disagreement line
    joined = "\n".join(
        conclusion_lines_for(rows(0.0144738, 0.0144845), timing, timing)
    )
    assert "Metric disagreement" not in joined
    # clearly separated CIs in opposite directions -> the line fires
    sep = [
        dict(r) for r in rows(
            0.010, 0.020, rect_ci=(0.009, 0.011), base_ci=(0.019, 0.021)
        )
    ]
    sep[0].update(fid_deep_lo=10.3, fid_deep_hi=11.9)  # base fid separates
    sep[1].update(fid_deep_lo=12.5, fid_deep_hi=14.4)
    joined = "\n".join(conclusion_lines_for(sep, timing, timing))
    assert "Metric disagreement" in joined


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
