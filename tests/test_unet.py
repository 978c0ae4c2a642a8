"""UNet backbone tests: golden param count, shapes, determinism, dropout.

The reference has ZERO automated coverage of its models (its tests
re-implement formulas inline, reference: tests/test_utils.py:98-143); these
tests call the real model code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectified_flow_vision_tpu.models.unet import UNet, count_parameters

GOLDEN_PARAM_COUNT = 11_255_363  # reference UNet at default config


class TestUNetStructure:
    def test_golden_param_count(self):
        """Default config matches the reference's 11,255,363 params
        (reference: models/unet.py:278-280 measured on configs/config.yaml)."""
        unet = UNet()
        params = unet.init(jax.random.key(0))
        assert count_parameters(params) == GOLDEN_PARAM_COUNT

    def test_param_count_scales_with_channels(self):
        small = UNet(model_channels=32)
        big = UNet(model_channels=64)
        n_small = count_parameters(small.init(jax.random.key(0)))
        n_big = count_parameters(big.init(jax.random.key(0)))
        assert n_small < n_big

    def test_forward_shape_64(self):
        unet = UNet()
        params = unet.init(jax.random.key(0))
        x = jnp.zeros((2, 64, 64, 3))
        t = jnp.array([0.1, 0.9])
        y = unet.apply(params, x, t)
        assert y.shape == (2, 64, 64, 3)
        assert y.dtype == jnp.float32

    @pytest.mark.parametrize("size", [16, 32])
    def test_forward_shape_other_sizes(self, size):
        unet = UNet(model_channels=32, channel_mult=(1, 2), num_res_blocks=1)
        params = unet.init(jax.random.key(0))
        x = jnp.zeros((1, size, size, 3))
        y = unet.apply(params, x, jnp.array([0.5]))
        assert y.shape == (1, size, size, 3)

    def test_bf16_compute(self):
        unet = UNet(model_channels=32, channel_mult=(1, 2), num_res_blocks=1)
        params = unet.init(jax.random.key(0))
        x = jnp.ones((1, 16, 16, 3))
        y = unet.apply(params, x, jnp.array([0.5]), compute_dtype=jnp.bfloat16)
        assert y.dtype == jnp.bfloat16
        yf = unet.apply(params, x, jnp.array([0.5]))
        # bf16 forward tracks the fp32 forward
        assert float(jnp.max(jnp.abs(yf - y.astype(jnp.float32)))) < 0.1


class TestUNetBehavior:
    def test_deterministic_eval(self):
        unet = UNet(model_channels=32, channel_mult=(1, 2), num_res_blocks=1)
        params = unet.init(jax.random.key(0))
        x = jax.random.normal(jax.random.key(1), (2, 16, 16, 3))
        t = jnp.array([0.3, 0.7])
        y1 = unet.apply(params, x, t)
        y2 = unet.apply(params, x, t)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))

    def test_dropout_train_vs_eval(self):
        unet = UNet(
            model_channels=32, channel_mult=(1, 2), num_res_blocks=1, dropout=0.5
        )
        params = unet.init(jax.random.key(0))
        x = jax.random.normal(jax.random.key(1), (2, 16, 16, 3))
        t = jnp.array([0.3, 0.7])
        y_eval = unet.apply(params, x, t)
        y_train = unet.apply(params, x, t, train=True, rng=jax.random.key(2))
        assert not np.allclose(np.asarray(y_eval), np.asarray(y_train))
        # distinct dropout keys give distinct outputs
        y_train2 = unet.apply(params, x, t, train=True, rng=jax.random.key(3))
        assert not np.allclose(np.asarray(y_train), np.asarray(y_train2))

    def test_time_dependence(self):
        unet = UNet(model_channels=32, channel_mult=(1, 2), num_res_blocks=1)
        params = unet.init(jax.random.key(0))
        x = jax.random.normal(jax.random.key(1), (1, 16, 16, 3))
        y0 = unet.apply(params, x, jnp.array([0.0]))
        y1 = unet.apply(params, x, jnp.array([1.0]))
        assert not np.allclose(np.asarray(y0), np.asarray(y1))

    def test_jit_matches_eager(self):
        unet = UNet(model_channels=32, channel_mult=(1, 2), num_res_blocks=1)
        params = unet.init(jax.random.key(0))
        x = jax.random.normal(jax.random.key(1), (2, 16, 16, 3))
        t = jnp.array([0.2, 0.8])
        eager = unet.apply(params, x, t)
        jitted = jax.jit(lambda p, x, t: unet.apply(p, x, t))(params, x, t)
        np.testing.assert_allclose(
            np.asarray(eager), np.asarray(jitted), rtol=1e-5, atol=1e-5
        )


class TestInitDistribution:
    def test_conv_init_bounds(self):
        """torch-default kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))."""
        from rectified_flow_vision_tpu.ops.primitives import conv_init

        p = conv_init(jax.random.key(0), 3, 3, 64, 64)
        bound = 1.0 / np.sqrt(64 * 9)
        w = np.asarray(p["w"])
        assert w.shape == (3, 3, 64, 64)
        assert w.min() >= -bound and w.max() <= bound
        # roughly uniform: std of U(-b, b) is b/sqrt(3)
        assert abs(w.std() - bound / np.sqrt(3)) < bound * 0.05

    def test_groupnorm_init(self):
        from rectified_flow_vision_tpu.ops.primitives import groupnorm_init

        p = groupnorm_init(32)
        assert np.all(np.asarray(p["scale"]) == 1.0)
        assert np.all(np.asarray(p["bias"]) == 0.0)
