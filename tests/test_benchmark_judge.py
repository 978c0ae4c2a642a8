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
