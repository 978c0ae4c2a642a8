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

    def test_apply_full_head_shapes(self):
        import jax

        params = synthnet.init_params(jax.random.key(0))
        x = np.zeros((2, 64, 64, 3), np.float32)
        out = synthnet.apply_full(params, x)
        assert out["counts"].shape == (
            2, synthnet.NUM_TYPES, synthnet.MAX_COUNT + 1,
        )
        assert out["blur"].shape == (2, synthnet.NUM_LEVELS)
        assert out["noise"].shape == (2, synthnet.NUM_LEVELS)

    def test_corrupted_corpus_labels(self):
        imgs, counts, blur, noise = synthnet.make_corrupted_corpus(8, 32, seed=5)
        assert imgs.shape == (8, 32, 32, 3)
        assert ((0 <= blur) & (blur < synthnet.NUM_LEVELS)).all()
        assert ((0 <= noise) & (noise < synthnet.NUM_LEVELS)).all()
        assert (counts.sum(axis=1) >= 3).all() and (counts.sum(axis=1) <= 7).all()

    @needs_weights
    def test_weights_roundtrip(self, backbone):
        x = np.zeros((1, 3, 64, 64), np.float32)
        f = backbone.fid_features(x)
        assert f.shape == (1, sum(synthnet.STAGE_CHANNELS))
        assert np.isfinite(f).all()


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
        assert d_self < d_small < d_big
        # a lightly-distorted copy must stay closer than an unrelated image;
        # heavy noise (sigma 0.3) may legitimately exceed it — the v2
        # corruption-trained trunk treats strong noise as highly salient
        # (as real LPIPS does), which is exactly what fixed the fid_deep
        # blur/noise blind spot
        assert d_small < d_other

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

    def test_fid_deep_blur_calibration(self, backbone, corpora):
        """fid_deep must PUNISH blur, monotonically (VERDICT r3 weak #1).

        The round-3 backbone scored a trained base model's 1-step
        near-mean mush (committed cifar32 CSV: base@1 fid_deep 7.47)
        level with sharp samples; a metric that ranks blur well cannot
        adjudicate 1-step claims. v2's blur aux head exists exactly so
        this test holds: a Gaussian-blurred corpus must score strictly
        worse than the sharp split-half baseline, increasingly in sigma.
        """
        a, b = corpora
        calc = MetricsCalculator()
        fid_sharp = calc.compute_fid_deep(a, b)
        fids = [fid_sharp]
        for sigma in (0.7, 1.4, 2.1):
            blurred = np.stack(
                [
                    synthnet.gaussian_blur(img, sigma)
                    for img in b.transpose(0, 2, 3, 1)
                ]
            ).transpose(0, 3, 1, 2)
            fids.append(calc.compute_fid_deep(a, blurred))
        assert all(n > p for p, n in zip(fids, fids[1:])), fids
        assert fids[-1] > 3.0 * fid_sharp, fids

    def test_fid_deep_mean_collapse_calibration(self, backbone, corpora):
        """fid_deep must punish mean-collapse (the 1-step failure mode):
        samples clustered near the corpus mean image score far worse than
        a genuine disjoint draw from the distribution."""
        a, b = corpora
        calc = MetricsCalculator()
        rng = np.random.default_rng(9)
        mean_img = a.mean(axis=0, keepdims=True)
        mush = np.clip(
            mean_img + 0.05 * rng.normal(0, 1, b.shape).astype(np.float32),
            -1, 1,
        )
        fid_sharp = calc.compute_fid_deep(a, b)
        fid_mush = calc.compute_fid_deep(a, mush)
        assert fid_mush > 3.0 * fid_sharp, (fid_sharp, fid_mush)

    def test_fid_deep_noise_calibration(self, backbone, corpora):
        """fid_deep must rank additive-noise corruption monotonically."""
        a, b = corpora
        calc = MetricsCalculator()
        rng = np.random.default_rng(13)
        eps = rng.normal(0, 1, b.shape).astype(np.float32)
        fids = [
            calc.compute_fid_deep(a, np.clip(b + s * eps, -1, 1))
            for s in (0.0, 0.1, 0.25)
        ]
        assert fids[0] < fids[1] < fids[2], fids


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


@needs_weights
@pytest.mark.slow
def test_fid_deep_base_one_step_worse_than_many_step():
    """On the committed flagship BASE checkpoint, fid_deep must rank the
    blurry 1-step output strictly worse than the converged many-step
    output (the calibration VERDICT r3 weak #1 found missing: the old
    backbone scored base@1 near-best at 32x32)."""
    import jax

    from rectified_flow_vision_tpu.config import repo_root
    from rectified_flow_vision_tpu.data import ImageDataset
    from rectified_flow_vision_tpu.models import BaseFlowModel

    ckpt = repo_root() / "checkpoints" / "base_flow_ema_final.npz"
    if not ckpt.exists():
        ckpt = repo_root() / "checkpoints" / "base_flow_final.npz"
    data_dir = repo_root() / "data" / "mock_images"
    if not ckpt.exists() or not data_dir.exists():
        pytest.skip("committed flagship artifacts not present")

    model = BaseFlowModel.from_checkpoint(str(ckpt))
    refs = ImageDataset(str(data_dir), 64).images[:64]
    noise = jax.random.normal(jax.random.key(17), (64, 64, 64, 3))
    few = np.asarray(model.sample(noise=noise, num_steps=1, data_format="NHWC"))
    many = np.asarray(
        model.sample(noise=noise, num_steps=100, data_format="NHWC")
    )

    calc = MetricsCalculator()
    refs_nchw = np.transpose(refs, (0, 3, 1, 2))
    fid_few = calc.compute_fid_deep(refs_nchw, np.transpose(few, (0, 3, 1, 2)))
    fid_many = calc.compute_fid_deep(
        refs_nchw, np.transpose(many, (0, 3, 1, 2))
    )
    assert np.isfinite(fid_few) and np.isfinite(fid_many)
    assert fid_many < fid_few, (fid_many, fid_few)
