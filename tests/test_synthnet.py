"""SynthNet stand-in metric backbone: behavior + calculator wiring.

The reference ships NaN for LPIPS when the lpips package is absent
(reference: utils/metrics.py:33-36). SynthNet (utils/synthnet.py) replaces
that permanent NaN with a domain-trained feature backbone; these tests pin
the properties that make it a usable metric: distribution separation for
FID and monotonicity under distortion for the perceptual distance.
"""

import numpy as np
import pytest

from rectified_flow_vision_tpu.utils import synthnet
from rectified_flow_vision_tpu.utils.metrics import MetricsCalculator

needs_weights = pytest.mark.skipif(
    not synthnet.DEFAULT_WEIGHTS_PATH.exists(),
    reason="weights/synthnet.npz not trained",
)


@pytest.fixture(scope="module")
def backbone():
    return synthnet.SynthNetPerceptual.load_default()


@pytest.fixture(scope="module")
def corpora():
    a, _ = synthnet.make_labeled_corpus(48, 64, seed=11)
    b, _ = synthnet.make_labeled_corpus(48, 64, seed=12)
    return a.transpose(0, 3, 1, 2), b.transpose(0, 3, 1, 2)


class TestModel:
    def test_forward_shapes(self):
        params = synthnet.init_params(__import__("jax").random.key(0))
        x = np.zeros((2, 64, 64, 3), np.float32)
        logits, taps = synthnet.apply(params, x)
        assert logits.shape == (2, synthnet.NUM_TYPES, synthnet.MAX_COUNT + 1)
        assert len(taps) == len(synthnet.STAGE_CHANNELS)
        assert taps[-1].shape == (2, 8, 8, 256)

    def test_labeled_generator_counts(self):
        rng = np.random.default_rng(0)
        img, counts = synthnet.synthesize_labeled_image(rng, 64)
        assert img.shape == (64, 64, 3) and img.dtype == np.uint8
        assert 3 <= counts.sum() <= 7

    @needs_weights
    def test_weights_roundtrip(self, backbone):
        x = np.zeros((1, 3, 64, 64), np.float32)
        f = backbone.fid_features(x)
        assert f.shape == (1, 256) and np.isfinite(f).all()


@needs_weights
class TestAsMetric:
    def test_fid_separates_distributions(self, backbone, corpora):
        a, b = corpora
        calc = MetricsCalculator()
        noise = (
            np.random.default_rng(0)
            .normal(0, 1, a.shape)
            .astype(np.float32)
            .clip(-1, 1)
        )
        fid_same = calc.compute_fid(a, b, feature_fn=backbone.fid_features)
        fid_noise = calc.compute_fid(a, noise, feature_fn=backbone.fid_features)
        assert np.isfinite(fid_same) and np.isfinite(fid_noise)
        assert fid_noise > 10 * fid_same

    def test_distance_monotone_in_distortion(self, backbone, corpora):
        a, b = corpora
        x = a[:16]
        noise = (
            np.random.default_rng(1).normal(0, 1, x.shape).astype(np.float32)
        )
        d_self = backbone(x, x).mean()
        d_small = backbone(x, np.clip(x + 0.05 * noise, -1, 1)).mean()
        d_big = backbone(x, np.clip(x + 0.3 * noise, -1, 1)).mean()
        d_other = backbone(x, b[:16]).mean()
        assert d_self < 1e-6
        assert d_self < d_small < d_big < d_other

    def test_calculator_fallback_produces_numbers(self, corpora):
        """With synthnet.npz present, LPIPS and deep FID stop being NaN."""
        a, b = corpora
        calc = MetricsCalculator()
        lp = calc.compute_lpips(a[:8], b[:8])
        fid = calc.compute_fid_inception(a, b)
        deep = calc.compute_fid_deep(a, b)
        assert np.isfinite(lp) and lp > 0
        assert np.isfinite(fid) and np.isfinite(deep)
