"""Flow math + sampler + checkpoint tests against the real model code."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectified_flow_vision_tpu.models import BaseFlowModel, RectifiedFlowModel


@pytest.fixture(scope="module")
def tiny_model():
    return BaseFlowModel(
        image_size=16,
        model_channels=16,
        channel_mult=[1, 2],
        num_res_blocks=1,
        sample_dtype="float32",
    )


class TestInterpolation:
    """Flow-math identities via the REAL get_interpolation (the reference's
    tests re-implement the formula inline, tests/test_utils.py:98-143)."""

    def test_t0_returns_x0(self, tiny_model):
        x0 = np.random.randn(2, 3, 8, 8).astype(np.float32)
        x1 = np.random.randn(2, 3, 8, 8).astype(np.float32)
        x_t, _ = tiny_model.get_interpolation(x0, x1, np.zeros(2, np.float32))
        np.testing.assert_allclose(np.asarray(x_t), x0, rtol=1e-6)

    def test_t1_returns_x1(self, tiny_model):
        x0 = np.random.randn(2, 3, 8, 8).astype(np.float32)
        x1 = np.random.randn(2, 3, 8, 8).astype(np.float32)
        x_t, _ = tiny_model.get_interpolation(x0, x1, np.ones(2, np.float32))
        np.testing.assert_allclose(np.asarray(x_t), x1, rtol=1e-6)

    def test_midpoint(self, tiny_model):
        x0 = np.zeros((2, 3, 8, 8), np.float32)
        x1 = np.ones((2, 3, 8, 8), np.float32)
        x_t, _ = tiny_model.get_interpolation(x0, x1, np.full(2, 0.5, np.float32))
        np.testing.assert_allclose(np.asarray(x_t), 0.5, rtol=1e-6)

    def test_velocity_target(self, tiny_model):
        x0 = np.random.randn(2, 3, 8, 8).astype(np.float32)
        x1 = np.random.randn(2, 3, 8, 8).astype(np.float32)
        _, target = tiny_model.get_interpolation(x0, x1, np.full(2, 0.3, np.float32))
        np.testing.assert_allclose(np.asarray(target), x1 - x0, rtol=1e-6)

    def test_per_sample_t(self, tiny_model):
        """t broadcasts per sample, not shared."""
        x0 = np.zeros((2, 3, 4, 4), np.float32)
        x1 = np.ones((2, 3, 4, 4), np.float32)
        x_t, _ = tiny_model.get_interpolation(x0, x1, np.array([0.0, 1.0], np.float32))
        np.testing.assert_allclose(np.asarray(x_t)[0], 0.0)
        np.testing.assert_allclose(np.asarray(x_t)[1], 1.0)


class TestSampler:
    def test_shapes_nchw_default(self, tiny_model):
        s = tiny_model.sample(num_steps=2, batch_size=3)
        assert s.shape == (3, 3, 16, 16)

    def test_shapes_nhwc(self, tiny_model):
        s = tiny_model.sample(num_steps=2, batch_size=3, data_format="NHWC")
        assert s.shape == (3, 16, 16, 3)

    def test_trajectory_length_and_start(self, tiny_model):
        noise = np.random.randn(2, 3, 16, 16).astype(np.float32)
        traj = tiny_model.sample(noise=noise, num_steps=5, return_trajectory=True)
        assert len(traj) == 6  # noise + 5 states (reference: base_flow.py:160-172)
        np.testing.assert_allclose(np.asarray(traj[0]), noise, rtol=1e-6)

    def test_scan_matches_manual_euler(self, tiny_model):
        """The fused scan equals a hand-rolled Euler loop through forward()."""
        noise = np.random.randn(2, 3, 16, 16).astype(np.float32)
        got = np.asarray(tiny_model.sample(noise=noise, num_steps=4))

        x = jnp.asarray(noise)
        dt = 1.0 / 4
        for i in range(4):
            t = jnp.full((2,), i * dt, jnp.float32)
            v = tiny_model.forward(x, t)
            x = x + v * dt
        np.testing.assert_allclose(got, np.asarray(x), rtol=2e-4, atol=2e-4)

    def test_deterministic_given_noise(self, tiny_model):
        noise = np.random.randn(1, 3, 16, 16).astype(np.float32)
        s1 = np.asarray(tiny_model.sample(noise=noise, num_steps=3))
        s2 = np.asarray(tiny_model.sample(noise=noise, num_steps=3))
        np.testing.assert_array_equal(s1, s2)

    def test_sample_with_trajectory_cadence(self, tiny_model):
        noise = np.random.randn(1, 3, 16, 16).astype(np.float32)
        snaps = tiny_model.sample_with_trajectory(noise, num_steps=10, save_every=5)
        assert len(snaps) == 3  # x_0, x_5, x_10


class TestLoss:
    def test_loss_positive_scalar(self, tiny_model):
        x1 = np.random.randn(4, 3, 16, 16).astype(np.float32)
        loss = tiny_model.compute_loss(x1)
        assert np.asarray(loss).shape == ()
        assert float(loss) > 0

    def test_loss_reproducible_with_key(self, tiny_model):
        x1 = np.random.randn(4, 3, 16, 16).astype(np.float32)
        l1 = float(tiny_model.compute_loss(x1, rng=jax.random.key(5)))
        l2 = float(tiny_model.compute_loss(x1, rng=jax.random.key(5)))
        assert l1 == l2

    def test_perfect_model_zero_loss(self):
        """If the net predicted exactly x1-x0 the loss would be 0; check the
        loss under a forced zero-output net equals E||x1-x0||^2-ish instead."""
        m = BaseFlowModel(
            image_size=8, model_channels=16, channel_mult=[1], num_res_blocks=1
        )
        zero_params = jax.tree_util.tree_map(jnp.zeros_like, m.params)
        x1 = np.random.randn(8, 8, 8, 3).astype(np.float32)
        loss = float(m.loss_fn(zero_params, jnp.asarray(x1), jax.random.key(0)))
        # zero net => loss = E||target||^2 = E||x1-x0||^2 ~ var(x1)+1 ~ 2
        assert 1.0 < loss < 4.0


class TestCheckpoint:
    def test_roundtrip(self, tiny_model, tmp_path):
        path = tmp_path / "m.npz"
        tiny_model.save(str(path))
        m2 = BaseFlowModel.from_checkpoint(str(path))
        assert m2.image_size == tiny_model.image_size
        for a, b in zip(
            jax.tree_util.tree_leaves(tiny_model.params),
            jax.tree_util.tree_leaves(m2.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_load_into_same_arch(self, tiny_model, tmp_path):
        path = tmp_path / "m.npz"
        tiny_model.save(str(path))
        fresh = BaseFlowModel(
            image_size=16,
            model_channels=16,
            channel_mult=[1, 2],
            num_res_blocks=1,
            sample_dtype="float32",
        )
        fresh.load(str(path))
        s1 = np.asarray(tiny_model.sample(noise=np.ones((1, 3, 16, 16)), num_steps=1))
        s2 = np.asarray(fresh.sample(noise=np.ones((1, 3, 16, 16)), num_steps=1))
        np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-5)

    def test_shape_mismatch_raises(self, tiny_model, tmp_path):
        path = tmp_path / "m.npz"
        tiny_model.save(str(path))
        wrong = BaseFlowModel(
            image_size=16, model_channels=32, channel_mult=[1, 2], num_res_blocks=1
        )
        with pytest.raises(ValueError, match="shape mismatch"):
            wrong.load(str(path))

    def test_config_stored(self, tiny_model, tmp_path):
        from rectified_flow_vision_tpu.utils.checkpoint import load_params

        path = tmp_path / "m.npz"
        tiny_model.save(str(path))
        _, config = load_params(str(path))
        assert config["image_size"] == 16
        assert config["channel_mult"] == [1, 2]
        assert config["model_type"] == "BaseFlowModel"
