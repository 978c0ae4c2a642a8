"""Training loop + reflow pipeline tests (real training on tiny models)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectified_flow_vision_tpu.models import (
    BaseFlowModel,
    RectifiedFlowModel,
    generate_reflow_pairs,
    iterative_reflow,
    train_base_flow,
    train_rectified_flow,
)
from rectified_flow_vision_tpu.models.base_flow import make_epoch_cosine_schedule

pytestmark = pytest.mark.slow  # heavy: training loops / e2e / multi-device jit


def _tiny(seed=0):
    return BaseFlowModel(
        image_size=8,
        model_channels=16,
        channel_mult=[1, 2],
        num_res_blocks=1,
        sample_dtype="float32",
        seed=seed,
    )


class TestCosineSchedule:
    def test_matches_torch_cosine_annealing(self):
        """Epoch e uses lr*(1+cos(pi*e/E))/2 — torch CosineAnnealingLR
        stepped per epoch (reference: base_flow.py:252,281)."""
        lr, epochs, spe = 1e-3, 10, 5
        sched = make_epoch_cosine_schedule(lr, epochs, spe)
        for e in range(epochs):
            want = 0.5 * lr * (1 + np.cos(np.pi * e / epochs))
            got = float(sched(e * spe))  # first step of epoch e
            got_last = float(sched(e * spe + spe - 1))  # last step, same lr
            assert abs(got - want) < 1e-9
            assert got == got_last

    def test_starts_at_lr_ends_near_zero(self):
        sched = make_epoch_cosine_schedule(1e-4, 50, 7)
        assert abs(float(sched(0)) - 1e-4) < 1e-10  # fp32 schedule eval
        assert float(sched(49 * 7)) < 1e-5


class TestTrainBaseFlow:
    def test_loss_decreases(self):
        m = _tiny()
        data = [np.random.RandomState(i).randn(8, 8, 8, 3).astype(np.float32) * 0.5
                for i in range(4)]
        losses = train_base_flow(m, data, epochs=5, lr=3e-3, progress=False)
        assert len(losses) == 5
        assert losses[-1] < losses[0]

    def test_checkpoint_cadence(self, tmp_path):
        m = _tiny()
        data = [np.random.randn(4, 8, 8, 3).astype(np.float32)]
        train_base_flow(
            m, data, epochs=4, lr=1e-3,
            save_path=str(tmp_path / "base_flow"), save_every=2, progress=False,
        )
        assert (tmp_path / "base_flow_epoch2.npz").exists()
        assert (tmp_path / "base_flow_epoch4.npz").exists()
        assert (tmp_path / "base_flow_final.npz").exists()
        assert not (tmp_path / "base_flow_epoch1.npz").exists()

    def test_dataset_input(self, tmp_path):
        from rectified_flow_vision_tpu.data import ImageDataset
        from rectified_flow_vision_tpu.utils.download_data import (
            generate_synthetic_images,
        )

        generate_synthetic_images(str(tmp_path / "imgs"), 6, 8, seed=0)
        ds = ImageDataset(str(tmp_path / "imgs"), 8)
        m = _tiny()
        losses = train_base_flow(
            m, ds, epochs=2, lr=1e-3, batch_size=4, progress=False
        )
        assert len(losses) == 2

    def test_params_actually_update(self):
        m = _tiny()
        before = jax.tree_util.tree_map(np.asarray, m.params)
        train_base_flow(
            m, [np.random.randn(4, 8, 8, 3).astype(np.float32)],
            epochs=1, lr=1e-3, progress=False,
        )
        changed = any(
            not np.allclose(a, np.asarray(b))
            for a, b in zip(
                jax.tree_util.tree_leaves(before),
                jax.tree_util.tree_leaves(m.params),
            )
        )
        assert changed


class TestDeviceEpochScan:
    """The one-dispatch-per-epoch lax.scan path must produce the SAME
    training trajectory as the per-step host loop (same RNG streams, same
    batch permutations) — it is a perf lever, not a semantics change."""

    def test_base_scan_matches_per_step(self):
        from rectified_flow_vision_tpu.data import ArrayDataset

        imgs = np.random.RandomState(0).randn(12, 8, 8, 3).astype(np.float32)
        losses = {}
        params = {}
        for mode in (False, True):
            m = _tiny(seed=3)
            losses[mode] = train_base_flow(
                m, ArrayDataset(imgs), epochs=3, lr=1e-3, batch_size=4,
                progress=False, device_epoch=mode,
            )
            params[mode] = jax.tree_util.tree_map(np.asarray, m.params)
        np.testing.assert_allclose(
            losses[False], losses[True], rtol=1e-5, atol=1e-6
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(params[False]),
            jax.tree_util.tree_leaves(params[True]),
        ):
            # the scan and per-step executables reassociate float ops
            # differently; identical trajectories up to ulp-level noise
            np.testing.assert_allclose(a, b, rtol=1e-3, atol=5e-5)

    def test_coupled_scan_matches_per_step(self):
        rng = np.random.RandomState(1)
        x0 = rng.randn(12, 3, 8, 8).astype(np.float32)
        x1 = rng.randn(12, 3, 8, 8).astype(np.float32)
        losses = {}
        params = {}
        for mode in (False, True):
            m = RectifiedFlowModel.from_base_model(_tiny(seed=5))
            losses[mode] = train_rectified_flow(
                m, x0, x1, epochs=3, batch_size=4, lr=1e-3,
                progress=False, device_epoch=mode,
            )
            params[mode] = jax.tree_util.tree_map(np.asarray, m.params)
        np.testing.assert_allclose(
            losses[False], losses[True], rtol=1e-5, atol=1e-6
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(params[False]),
            jax.tree_util.tree_leaves(params[True]),
        ):
            # the scan and per-step executables reassociate float ops
            # differently; identical trajectories up to ulp-level noise
            np.testing.assert_allclose(a, b, rtol=1e-3, atol=5e-5)


class TestReflow:
    def test_pair_generation_shapes(self):
        m = _tiny()
        x0, x1 = generate_reflow_pairs(m, num_pairs=10, batch_size=4, num_steps=2)
        assert x0.shape == (10, 3, 8, 8)
        assert x1.shape == (10, 3, 8, 8)

    def test_pairs_consistent_with_teacher(self):
        """x1 must be the teacher's sample from x0 (coupling integrity)."""
        m = _tiny()
        x0, x1 = generate_reflow_pairs(
            m, num_pairs=4, batch_size=4, num_steps=3, seed=9
        )
        resampled = np.asarray(m.sample(noise=x0, num_steps=3))
        np.testing.assert_allclose(x1, resampled, rtol=1e-4, atol=1e-4)

    def test_from_base_model_fresh_weights(self):
        base = _tiny(seed=0)
        rect = RectifiedFlowModel.from_base_model(base)
        # fresh init by default (reference: rectified_flow.py:77-78 comment)
        same = all(
            np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree_util.tree_leaves(base.params),
                jax.tree_util.tree_leaves(rect.params),
            )
        )
        assert not same
        rect2 = RectifiedFlowModel.from_base_model(base, copy_weights=True)
        same2 = all(
            np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree_util.tree_leaves(base.params),
                jax.tree_util.tree_leaves(rect2.params),
            )
        )
        assert same2

    def test_train_rectified_loss_decreases(self):
        base = _tiny()
        x0, x1 = generate_reflow_pairs(base, num_pairs=16, batch_size=8, num_steps=2)
        rect = RectifiedFlowModel.from_base_model(base)
        losses = train_rectified_flow(
            rect, x0, x1, epochs=4, batch_size=8, lr=3e-3, progress=False
        )
        assert losses[-1] < losses[0]

    def test_straightness_nonnegative_and_improves(self):
        base = _tiny()
        x0, x1 = generate_reflow_pairs(base, num_pairs=16, batch_size=8, num_steps=2)
        rect = RectifiedFlowModel.from_base_model(base)
        s_before = rect.compute_straightness(x0[:4], x1[:4], num_points=4)
        train_rectified_flow(
            rect, x0, x1, epochs=6, batch_size=8, lr=3e-3, progress=False
        )
        s_after = rect.compute_straightness(x0[:4], x1[:4], num_points=4)
        assert s_before >= 0 and s_after >= 0
        assert s_after < s_before  # training on couplings straightens

    def test_iterative_reflow_promotes_teacher(self, tmp_path):
        base = _tiny()
        models = iterative_reflow(
            base,
            num_iterations=2,
            epochs_per_iter=1,
            num_pairs=8,
            teacher_steps=4,
            lr=1e-3,
            save_dir=str(tmp_path),
            pair_batch_size=8,
            batch_size=8,
        )
        assert len(models) == 2
        assert models[0].reflow_iteration == 1
        assert models[1].reflow_iteration == 2
        assert (tmp_path / "reflow_k1_final.npz").exists()
        assert (tmp_path / "reflow_k2_final.npz").exists()
