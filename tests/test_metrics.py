"""Metrics tests: superset of the reference's test_utils.py suite."""

import numpy as np
import pytest

from rectified_flow_vision_tpu.utils.metrics import MetricsCalculator
from rectified_flow_vision_tpu.utils.ssim import structural_similarity


@pytest.fixture
def calculator():
    return MetricsCalculator(device="cpu")


class TestMetricsCalculator:
    """Mirrors reference tests/test_utils.py:17-73 against our impl."""

    def test_calculator_initialization(self, calculator):
        assert calculator.device == "cpu"
        assert calculator._lpips_model is None  # lazy

    def test_ssim_identical(self, calculator):
        img = np.random.randint(0, 255, (64, 64, 3), dtype=np.uint8)
        assert calculator.compute_ssim(img, img) > 0.99

    def test_ssim_different(self, calculator):
        img1 = np.zeros((64, 64, 3), dtype=np.uint8)
        img2 = np.ones((64, 64, 3), dtype=np.uint8) * 255
        assert calculator.compute_ssim(img1, img2) < 0.5

    def test_ssim_shape_mismatch(self, calculator):
        img1 = np.random.randint(0, 255, (64, 64, 3), dtype=np.uint8)
        img2 = np.random.randint(0, 255, (32, 32, 3), dtype=np.uint8)
        with pytest.raises(ValueError):
            calculator.compute_ssim(img1, img2)

    def test_ssim_grayscale(self, calculator):
        img = np.random.randint(0, 255, (32, 32), dtype=np.uint8)
        assert calculator.compute_ssim(img, img) > 0.99

    def test_fid_statistics_shape(self, calculator):
        images = np.random.randn(10, 3, 64, 64).astype(np.float32)
        mu, sigma = calculator.compute_fid_statistics(images)
        n = 3 * 64 * 64
        assert mu.shape == (n,)
        assert sigma.shape == (n, n)

    def test_fid_identical_batches(self, calculator):
        images = np.random.randn(10, 3, 32, 32).astype(np.float32)
        assert calculator.compute_fid(images, images) < 1.0

    def test_fid_different_batches(self, calculator):
        images1 = np.random.randn(10, 3, 32, 32).astype(np.float32)
        images2 = np.random.randn(10, 3, 32, 32).astype(np.float32) * 2 + 1
        assert calculator.compute_fid(images1, images2) > 0

    def test_fid_orders_distances(self, calculator):
        """Closer distributions must get lower FID."""
        base = np.random.randn(20, 3, 16, 16).astype(np.float32)
        near = base + np.random.randn(*base.shape).astype(np.float32) * 0.1
        far = np.random.randn(20, 3, 16, 16).astype(np.float32) * 3 + 2
        assert calculator.compute_fid(base, near) < calculator.compute_fid(base, far)

    def test_fid_custom_feature_fn(self, calculator):
        imgs = np.random.randn(10, 3, 8, 8).astype(np.float32)
        feat = lambda x: x.reshape(x.shape[0], -1)[:, :16]  # noqa: E731
        fid = calculator.compute_fid(imgs, imgs, feature_fn=feat)
        assert fid < 1.0

    def test_lpips_nan_fallback(self, calculator):
        """No pretrained weights in this environment => NaN (reference
        semantics, metrics.py:33-36,66-67)."""
        a = np.random.randn(2, 3, 32, 32).astype(np.float32)
        out = calculator.compute_lpips(a, a)
        assert np.isnan(out) or out < 1e-5  # NaN without weights; ~0 with


class TestSSIMImplementation:
    def test_constant_images(self):
        a = np.full((32, 32), 128.0)
        assert structural_similarity(a, a, data_range=255) == pytest.approx(1.0)

    def test_noise_robustness_monotonic(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (64, 64)).astype(np.float64)
        small = np.clip(img + rng.normal(0, 5, img.shape), 0, 255)
        large = np.clip(img + rng.normal(0, 60, img.shape), 0, 255)
        s_small = structural_similarity(img, small, data_range=255)
        s_large = structural_similarity(img, large, data_range=255)
        assert s_small > s_large

    def test_symmetry(self):
        rng = np.random.default_rng(1)
        a = rng.integers(0, 255, (32, 32, 3)).astype(np.float64)
        b = rng.integers(0, 255, (32, 32, 3)).astype(np.float64)
        s1 = structural_similarity(a, b, channel_axis=2, data_range=255)
        s2 = structural_similarity(b, a, channel_axis=2, data_range=255)
        assert s1 == pytest.approx(s2)

    def test_range(self):
        rng = np.random.default_rng(2)
        a = rng.integers(0, 255, (32, 32)).astype(np.float64)
        b = rng.integers(0, 255, (32, 32)).astype(np.float64)
        s = structural_similarity(a, b, data_range=255)
        assert -1.0 <= s <= 1.0


class TestImageProcessing:
    """Reference tests/test_utils.py:76-95 parity."""

    def test_tensor_normalization(self):
        img = np.random.rand(1, 3, 64, 64)
        normalized = img * 2 - 1
        assert normalized.min() >= -1 and normalized.max() <= 1

    def test_tensor_denormalization(self):
        normalized = np.clip(np.random.randn(1, 3, 64, 64), -1, 1)
        denorm = (normalized + 1) / 2
        assert denorm.min() >= 0 and denorm.max() <= 1


class TestDataLoading:
    """Reference tests/test_utils.py:146-167 parity (JAX PRNG)."""

    def test_batch_shapes(self):
        batch = np.random.randn(4, 3, 64, 64)
        assert batch.shape == (4, 3, 64, 64)

    def test_noise_distribution(self):
        import jax

        noise = np.asarray(
            jax.random.normal(jax.random.key(42), (1000, 3, 32, 32))
        )
        assert abs(noise.mean()) < 0.1
        assert abs(noise.std() - 1.0) < 0.1


class TestFIDFastPath:
    """The low-rank Gram-matrix FID must equal the direct-covariance FID."""

    def test_fast_equals_direct(self, calculator):
        rng = np.random.default_rng(0)
        f1 = rng.normal(0, 1, (12, 3, 24, 24)).astype(np.float32)
        f2 = rng.normal(0.3, 1.2, (10, 3, 24, 24)).astype(np.float32)

        fast = calculator.compute_fid(f1, f2)  # d=1728 >> n -> fast path

        # direct reference computation
        from scipy import linalg as sl

        a = f1.reshape(12, -1).astype(np.float64)
        b = f2.reshape(10, -1).astype(np.float64)
        mu1, mu2 = a.mean(0), b.mean(0)
        s1 = np.cov(a, rowvar=False)
        s2 = np.cov(b, rowvar=False)
        covmean, _ = sl.sqrtm(s1 @ s2, disp=False)
        direct = float(
            (mu1 - mu2) @ (mu1 - mu2) + np.trace(s1 + s2 - 2 * covmean.real)
        )
        assert abs(fast - direct) / max(abs(direct), 1e-9) < 1e-6

    def test_fast_path_identical_batches_near_zero(self, calculator):
        imgs = np.random.randn(8, 3, 64, 64).astype(np.float32)
        assert calculator.compute_fid(imgs, imgs) < 1e-3


class TestLpipsSetStatsCI:
    """The nearest-neighbor perceptual statistics carry bootstrap CIs
    (VERDICT r4 ask #6): reports gate 'disagreement' lines on interval
    separation, so the intervals must exist and bracket the mean."""

    class _StubPerceptual:
        """Deterministic distance = mean absolute pixel difference."""

        def pairwise_distance(self, a, b):
            a = a.reshape(a.shape[0], -1)[:, None, :]
            b = b.reshape(b.shape[0], -1)[None, :, :]
            return np.abs(a - b).mean(-1)

    def test_ci_keys_bracket_the_mean(self, calculator):
        calculator._lpips_model = self._StubPerceptual()
        rng = np.random.default_rng(3)
        gen = rng.normal(0, 1, (40, 3, 8, 8)).astype(np.float32)
        ref = rng.normal(0.2, 1, (30, 3, 8, 8)).astype(np.float32)
        s = calculator.compute_lpips_set_stats(gen, ref)
        for stat in ("precision", "recall"):
            assert np.isfinite(s[stat])
            assert s[f"{stat}_lo"] <= s[stat] <= s[f"{stat}_hi"]
            assert s[f"{stat}_hi"] > s[f"{stat}_lo"]

    def test_nan_fallback_carries_all_keys(self, calculator):
        calculator._lpips_model = None

        class _NoBackbone:
            lpips_model = None

        import rectified_flow_vision_tpu.utils.metrics as m

        calc = m.MetricsCalculator()
        calc.__class__ = type(
            "C", (m.MetricsCalculator,), {"lpips_model": None}
        )
        s = calc.compute_lpips_set_stats(
            np.zeros((4, 3, 8, 8)), np.zeros((4, 3, 8, 8))
        )
        assert set(s) == {
            "precision", "precision_lo", "precision_hi",
            "recall", "recall_lo", "recall_hi",
        }
        assert all(np.isnan(v) for v in s.values())
