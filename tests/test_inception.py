"""InceptionV3-JAX FID backbone tests (synthetic weights)."""

import numpy as np
import pytest

from rectified_flow_vision_tpu.utils.inception_jax import (
    CONV_SPECS,
    FEATURE_DIM_IN,
    InceptionV3Features,
    synthetic_weights,
)


class TestArchitecture:
    def test_spec_inventory(self):
        """The torchvision InceptionV3 feature trunk has 94 BasicConv2d."""
        assert len(CONV_SPECS) == 94
        assert FEATURE_DIM_IN == 2048

    def test_channel_chain_consistency(self):
        """Every 1x1/stem layer's input channels match its producer."""
        # spot-check the concat arithmetic encoded in the spec builders
        assert CONV_SPECS["Mixed_5b.branch1x1"][0] == 192
        assert CONV_SPECS["Mixed_5c.branch1x1"][0] == 256  # 64+64+96+32
        assert CONV_SPECS["Mixed_6a.branch3x3"][0] == 288  # 64+64+96+64
        assert CONV_SPECS["Mixed_6b.branch1x1"][0] == 768
        assert CONV_SPECS["Mixed_7a.branch3x3_1"][0] == 768
        assert CONV_SPECS["Mixed_7b.branch1x1"][0] == 1280
        assert CONV_SPECS["Mixed_7c.branch1x1"][0] == 2048


@pytest.fixture(scope="module")
def model():
    return InceptionV3Features(synthetic_weights())


class TestForward:
    def test_feature_shape(self, model):
        x = np.random.default_rng(0).normal(0, 0.5, (2, 3, 64, 64)).astype(
            np.float32
        )
        feats = model(x)
        assert feats.shape == (2, 2048)
        assert np.isfinite(feats).all()

    def test_deterministic(self, model):
        x = np.random.default_rng(1).normal(0, 0.5, (1, 3, 32, 32)).astype(
            np.float32
        )
        np.testing.assert_array_equal(model(x), model(x))

    def test_input_sensitivity(self, model):
        rng = np.random.default_rng(2)
        a = rng.normal(0, 0.5, (1, 3, 32, 32)).astype(np.float32)
        b = rng.normal(0, 0.5, (1, 3, 32, 32)).astype(np.float32)
        assert not np.allclose(model(a), model(b))


class TestFIDIntegration:
    def test_fid_inception_with_synthetic_weights(self, model, monkeypatch):
        from rectified_flow_vision_tpu.utils.metrics import MetricsCalculator

        calc = MetricsCalculator()
        monkeypatch.setattr(calc, "_inception_model", model)
        rng = np.random.default_rng(3)
        a = rng.normal(0, 0.4, (6, 3, 32, 32)).astype(np.float32).clip(-1, 1)
        b = rng.normal(0.5, 0.8, (6, 3, 32, 32)).astype(np.float32).clip(-1, 1)
        same = calc.compute_fid_inception(a, a)
        diff = calc.compute_fid_inception(a, b)
        assert same < 1e-3
        assert diff > same

    def test_synthnet_fallback_or_nan(self, monkeypatch):
        """Inception weights -> SynthNet stand-in -> NaN (ref contract)."""
        from rectified_flow_vision_tpu.utils import synthnet
        from rectified_flow_vision_tpu.utils.metrics import MetricsCalculator

        a = np.zeros((2, 3, 32, 32), np.float32)
        if synthnet.DEFAULT_WEIGHTS_PATH.exists():
            assert np.isfinite(MetricsCalculator().compute_fid_inception(a, a))

        def _raise():
            raise FileNotFoundError("no weights")

        from rectified_flow_vision_tpu.utils import inception_jax

        monkeypatch.setattr(
            inception_jax.InceptionV3Features,
            "load_default",
            staticmethod(_raise),
        )
        monkeypatch.setattr(
            synthnet.SynthNetPerceptual, "load_default", staticmethod(_raise)
        )
        assert np.isnan(MetricsCalculator().compute_fid_inception(a, a))
