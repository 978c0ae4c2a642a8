"""Winograd F(2x2,3x3) conv equivalence vs the XLA direct conv.

The Winograd path is a performance strategy for the reference UNet's
3x3/stride-1 res-block convs (reference: models/unet.py:30-64); it must be
numerically interchangeable with ops.primitives.conv2d.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectified_flow_vision_tpu.ops.primitives import conv2d, conv_init
from rectified_flow_vision_tpu.ops.winograd import (
    conv2d_winograd,
    winograd_conv3x3,
)


@pytest.mark.parametrize(
    "shape,cin,cout",
    [
        ((2, 8, 8, 16), 16, 32),
        ((1, 16, 16, 8), 8, 8),
        ((3, 4, 6, 4), 4, 4),  # non-square, still even
    ],
)
def test_matches_direct_conv_fp32(shape, cin, cout):
    key = jax.random.key(0)
    p = conv_init(jax.random.key(1), 3, 3, cin, cout)
    x = jax.random.normal(key, shape, jnp.float32)
    ref = conv2d(x, p)
    out = conv2d_winograd(x, p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_bf16_error_comparable_to_direct_bf16():
    """In bf16 the Winograd transforms add rounding, but the result must
    stay within a small factor of the direct bf16 conv's own error vs the
    fp32 ground truth."""
    key = jax.random.key(2)
    p = conv_init(jax.random.key(3), 3, 3, 32, 32)
    x = jax.random.normal(key, (2, 16, 16, 32), jnp.float32)
    truth = np.asarray(conv2d(x, p), np.float32)

    direct_bf16 = np.asarray(
        conv2d(x.astype(jnp.bfloat16), p), np.float32
    )
    wino_bf16 = np.asarray(
        conv2d_winograd(x.astype(jnp.bfloat16), p), np.float32
    )
    err_direct = np.abs(direct_bf16 - truth).max()
    err_wino = np.abs(wino_bf16 - truth).max()
    assert err_wino <= 4.0 * max(err_direct, 1e-3), (err_wino, err_direct)


def test_gradients_match_direct():
    p = conv_init(jax.random.key(4), 3, 3, 8, 8)
    x = jax.random.normal(jax.random.key(5), (2, 8, 8, 8), jnp.float32)

    def loss_direct(w):
        return jnp.sum(jnp.square(conv2d(x, {"w": w, "b": p["b"]})))

    def loss_wino(w):
        return jnp.sum(jnp.square(winograd_conv3x3(x, w, p["b"])))

    g_ref = jax.grad(loss_direct)(p["w"])
    g_win = jax.grad(loss_wino)(p["w"])
    np.testing.assert_allclose(
        np.asarray(g_win), np.asarray(g_ref), atol=1e-2, rtol=1e-3
    )


def test_rejects_odd_spatial():
    p = conv_init(jax.random.key(6), 3, 3, 4, 4)
    x = jnp.zeros((1, 5, 8, 4))
    with pytest.raises(AssertionError):
        winograd_conv3x3(x, p["w"], p["b"])
