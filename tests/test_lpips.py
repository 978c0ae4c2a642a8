"""LPIPS-JAX architecture tests (synthetic weights; pretrained weights are
environment-dependent and covered by the NaN-fallback metric tests)."""

import numpy as np
import pytest

from rectified_flow_vision_tpu.utils.lpips_jax import _ALEX_LAYERS, LPIPS


def _synthetic_weights(seed=0):
    rng = np.random.default_rng(seed)
    w = {}
    in_ch = 3
    for i, (k, s, p, out_ch, _) in enumerate(_ALEX_LAYERS):
        w[f"conv{i}_w"] = rng.normal(0, 0.1, (k, k, in_ch, out_ch)).astype(
            np.float32
        )
        w[f"conv{i}_b"] = rng.normal(0, 0.01, (out_ch,)).astype(np.float32)
        w[f"lin{i}_w"] = rng.uniform(0, 1, (out_ch,)).astype(np.float32)
        in_ch = out_ch
    return w


@pytest.fixture(scope="module")
def model():
    return LPIPS(_synthetic_weights())


class TestLPIPS:
    def test_identical_images_zero(self, model):
        x = np.random.randn(2, 3, 64, 64).astype(np.float32).clip(-1, 1)
        d = model(x, x)
        assert d.shape == (2,)
        np.testing.assert_allclose(d, 0.0, atol=1e-6)

    def test_different_images_positive(self, model):
        rng = np.random.default_rng(0)
        a = rng.normal(0, 0.5, (2, 3, 64, 64)).astype(np.float32).clip(-1, 1)
        b = rng.normal(0, 0.5, (2, 3, 64, 64)).astype(np.float32).clip(-1, 1)
        assert (model(a, b) > 0).all()

    def test_symmetry(self, model):
        rng = np.random.default_rng(1)
        a = rng.normal(0, 0.5, (1, 3, 64, 64)).astype(np.float32).clip(-1, 1)
        b = rng.normal(0, 0.5, (1, 3, 64, 64)).astype(np.float32).clip(-1, 1)
        np.testing.assert_allclose(model(a, b), model(b, a), rtol=1e-5)

    def test_monotone_in_noise(self, model):
        rng = np.random.default_rng(2)
        a = rng.normal(0, 0.5, (1, 3, 64, 64)).astype(np.float32).clip(-1, 1)
        near = np.clip(a + rng.normal(0, 0.02, a.shape).astype(np.float32), -1, 1)
        far = np.clip(a + rng.normal(0, 0.5, a.shape).astype(np.float32), -1, 1)
        assert model(a, near)[0] < model(a, far)[0]

    def test_missing_weights_raises(self, tmp_path, monkeypatch):
        from rectified_flow_vision_tpu.utils import lpips_jax

        monkeypatch.setattr(
            lpips_jax, "DEFAULT_WEIGHTS_PATH", tmp_path / "nope.npz"
        )
        with pytest.raises(FileNotFoundError):
            LPIPS.load_default()


class TestDeepFID:
    def test_fid_deep_with_synthetic_weights(self, model, monkeypatch):
        from rectified_flow_vision_tpu.utils.metrics import MetricsCalculator

        calc = MetricsCalculator()
        monkeypatch.setattr(calc, "_lpips_model", model)  # inject weights
        rng = np.random.default_rng(0)
        a = rng.normal(0, 0.5, (8, 3, 64, 64)).astype(np.float32).clip(-1, 1)
        b = rng.normal(0.4, 0.8, (8, 3, 64, 64)).astype(np.float32).clip(-1, 1)
        same = calc.compute_fid_deep(a, a)
        diff = calc.compute_fid_deep(a, b)
        assert same < 1e-3
        assert diff > same

    def test_fid_deep_synthnet_fallback_or_nan(self, monkeypatch):
        """Preference chain: LPIPS weights -> SynthNet -> NaN.

        With weights/synthnet.npz committed, compute_fid_deep produces a
        real number; with EVERY backbone unavailable it keeps the
        reference's NaN contract (reference: utils/metrics.py:33-36).
        """
        from rectified_flow_vision_tpu.utils import synthnet
        from rectified_flow_vision_tpu.utils.metrics import MetricsCalculator

        a = np.zeros((4, 3, 64, 64), np.float32)
        if synthnet.DEFAULT_WEIGHTS_PATH.exists():
            assert np.isfinite(MetricsCalculator().compute_fid_deep(a, a))

        def _raise():
            raise FileNotFoundError("no weights")

        from rectified_flow_vision_tpu.utils import lpips_jax

        monkeypatch.setattr(
            lpips_jax.LPIPS, "load_default", staticmethod(_raise)
        )
        monkeypatch.setattr(
            synthnet.SynthNetPerceptual, "load_default", staticmethod(_raise)
        )
        assert np.isnan(MetricsCalculator().compute_fid_deep(a, a))
