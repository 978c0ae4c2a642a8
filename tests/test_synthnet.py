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

    def test_pairwise_matches_paired_on_diagonal(self, backbone, corpora):
        """The Gram-matrix all-pairs distance is EXACT: its diagonal equals
        the paired forward-pass distance."""
        a, b = corpora
        d_mat = backbone.pairwise_distance(a[:6], a[:6])
        d_paired = backbone(a[:6], a[:6])  # zeros
        np.testing.assert_allclose(np.diag(d_mat), d_paired, atol=1e-5)
        d_mat2 = backbone.pairwise_distance(a[:6], b[:6])
        d_paired2 = backbone(a[:6], b[:6])
        np.testing.assert_allclose(np.diag(d_mat2), d_paired2, atol=1e-5)

    def test_lpips_to_set_separates_quality(self, corpora):
        """The nearest-reference distance must RANK sample quality: in-domain
        samples far below noise, corruption strictly ordered in between.

        This is the calibration the round-2 committed CSVs lacked — their
        row-paired lpips column spanned ~0.006 across 1-step noise and
        64-step samples because unpaired comparisons sit at the
        unrelated-image plateau.
        """
        a, b = corpora
        calc = MetricsCalculator()
        refs = a  # 48 reference images
        rng = np.random.default_rng(3)
        # near-manifold samples (what a well-trained small-corpus model
        # emits: near-memorized corpus images), novel in-domain draws,
        # and pure noise must rank strictly in that order
        near = np.clip(
            refs[:16] + 0.05 * rng.normal(0, 1, refs[:16].shape)
            .astype(np.float32), -1, 1,
        )
        novel = b[:16]  # same distribution, disjoint draw
        noise = rng.normal(0, 1, novel.shape).astype(np.float32).clip(-1, 1)
        d_near = calc.compute_lpips_to_set(near, refs)
        d_novel = calc.compute_lpips_to_set(novel, refs)
        d_noise = calc.compute_lpips_to_set(noise, refs)
        assert d_near < d_novel < d_noise
        # dynamic range: noise far above near-manifold samples (the
        # row-paired column's committed spread was ~1.1x across everything)
        assert d_noise > 5.0 * d_near


@needs_weights
@pytest.mark.slow
def test_lpips_to_ref_separates_few_vs_many_step_samples():
    """On the committed flagship checkpoint, lpips_to_ref must separate
    1-step from 64-step base-model samples by a margin — the round-2
    committed lpips column could not (VERDICT weak #2)."""
    import jax

    from rectified_flow_vision_tpu.config import repo_root
    from rectified_flow_vision_tpu.models import BaseFlowModel

    ckpt = repo_root() / "checkpoints" / "base_flow_final.npz"
    data_dir = repo_root() / "data" / "mock_images"
    if not ckpt.exists() or not data_dir.exists():
        pytest.skip("committed flagship artifacts not present")

    from rectified_flow_vision_tpu.data import ImageDataset

    model = BaseFlowModel.from_checkpoint(str(ckpt))
    refs = ImageDataset(str(data_dir), 64).images[:32]
    noise = jax.random.normal(jax.random.key(7), (8, 64, 64, 3))
    few = np.asarray(model.sample(noise=noise, num_steps=1, data_format="NHWC"))
    many = np.asarray(model.sample(noise=noise, num_steps=64, data_format="NHWC"))

    calc = MetricsCalculator()
    refs_nchw = np.transpose(refs, (0, 3, 1, 2))
    d_few = calc.compute_lpips_to_set(np.transpose(few, (0, 3, 1, 2)), refs_nchw)
    d_many = calc.compute_lpips_to_set(np.transpose(many, (0, 3, 1, 2)), refs_nchw)
    assert np.isfinite(d_few) and np.isfinite(d_many)
    # 64-step samples must be measurably closer to the data manifold
    assert d_many < 0.8 * d_few
