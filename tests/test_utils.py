"""The reference's test suite, name-for-name (reference: tests/test_utils.py).

Every class and test the reference ships, passing against this framework's
implementations (numpy/JAX in place of torch tensors). The rest of tests/
goes far beyond this file — this one exists so a reference user's test
invocations (`pytest tests/test_utils.py::TestMetricsCalculator`) work
unchanged.
"""

import numpy as np
import pytest

from rectified_flow_vision_tpu.utils.metrics import MetricsCalculator


class TestMetricsCalculator:
    """Tests for MetricsCalculator class."""

    @pytest.fixture
    def calculator(self):
        return MetricsCalculator(device="cpu")

    def test_calculator_initialization(self, calculator):
        assert calculator.device == "cpu"
        assert calculator._lpips_model is None  # lazy loaded

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

    def test_fid_statistics_shape(self, calculator):
        images = np.random.randn(10, 3, 64, 64).astype(np.float32)
        mu, sigma = calculator.compute_fid_statistics(images)
        expected = 3 * 64 * 64
        assert mu.shape == (expected,)
        assert sigma.shape == (expected, expected)

    def test_fid_identical_batches(self, calculator):
        images = np.random.randn(10, 3, 32, 32).astype(np.float32)
        assert calculator.compute_fid(images, images) < 1.0

    def test_fid_different_batches(self, calculator):
        images1 = np.random.randn(10, 3, 32, 32).astype(np.float32)
        images2 = np.random.randn(10, 3, 32, 32).astype(np.float32) * 2 + 1
        assert calculator.compute_fid(images1, images2) > 0


class TestImageProcessing:
    """Tests for image processing utilities."""

    def test_tensor_normalization(self):
        img = np.random.rand(1, 3, 64, 64)
        normalized = img * 2 - 1
        assert normalized.min() >= -1
        assert normalized.max() <= 1

    def test_tensor_denormalization(self):
        normalized = np.clip(np.random.randn(1, 3, 64, 64), -1, 1)
        denormalized = (normalized + 1) / 2
        assert denormalized.min() >= 0
        assert denormalized.max() <= 1


class TestModelHelpers:
    """Tests for model helper functions.

    Unlike the reference (which re-implements the interpolation inline,
    reference: tests/test_utils.py:107-109), these call the REAL
    BaseFlowModel.get_interpolation.
    """

    def test_interpolation_t0(self):
        from rectified_flow_vision_tpu.models import BaseFlowModel

        x0 = np.random.randn(2, 3, 32, 32).astype(np.float32)
        x1 = np.random.randn(2, 3, 32, 32).astype(np.float32)
        x_t, _ = BaseFlowModel.get_interpolation(x0, x1, np.zeros(2, np.float32))
        np.testing.assert_allclose(np.asarray(x_t), x0, rtol=1e-6)

    def test_interpolation_t1(self):
        from rectified_flow_vision_tpu.models import BaseFlowModel

        x0 = np.random.randn(2, 3, 32, 32).astype(np.float32)
        x1 = np.random.randn(2, 3, 32, 32).astype(np.float32)
        x_t, _ = BaseFlowModel.get_interpolation(x0, x1, np.ones(2, np.float32))
        np.testing.assert_allclose(np.asarray(x_t), x1, rtol=1e-6)

    def test_interpolation_midpoint(self):
        from rectified_flow_vision_tpu.models import BaseFlowModel

        x0 = np.zeros((2, 3, 32, 32), np.float32)
        x1 = np.ones((2, 3, 32, 32), np.float32)
        x_t, _ = BaseFlowModel.get_interpolation(
            x0, x1, np.full(2, 0.5, np.float32)
        )
        np.testing.assert_allclose(np.asarray(x_t), 0.5, rtol=1e-6)

    def test_velocity_target(self):
        from rectified_flow_vision_tpu.models import BaseFlowModel

        x0 = np.random.randn(2, 3, 32, 32).astype(np.float32)
        x1 = np.random.randn(2, 3, 32, 32).astype(np.float32)
        _, velocity = BaseFlowModel.get_interpolation(
            x0, x1, np.full(2, 0.3, np.float32)
        )
        assert velocity.shape == x0.shape
        np.testing.assert_allclose(np.asarray(velocity), x1 - x0, rtol=1e-6)


class TestDataLoading:
    """Tests for data loading utilities."""

    def test_batch_shapes(self):
        batch = np.random.randn(4, 3, 64, 64)
        assert batch.shape == (4, 3, 64, 64)

    def test_noise_distribution(self):
        import jax

        noise = np.asarray(jax.random.normal(jax.random.key(42), (1000, 3, 32, 32)))
        assert abs(noise.mean()) < 0.1
        assert abs(noise.std() - 1.0) < 0.1


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
