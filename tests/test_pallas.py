"""Pallas kernel equivalence tests (interpret mode on CPU).

On CPU these run the kernels through the Pallas interpreter against the XLA
ground truth in ops.primitives; on a real TPU the same assertions hold for
the compiled kernels (exercised by the benchmark path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectified_flow_vision_tpu.ops import pallas_kernels as K
from rectified_flow_vision_tpu.ops import primitives as P
from rectified_flow_vision_tpu.ops.primitives import dense_init, groupnorm_init


@pytest.fixture(autouse=True)
def interpret_mode():
    K.set_interpret(True)
    yield
    K.set_interpret(False)


class TestGnSilu:
    @pytest.mark.parametrize(
        "shape", [(2, 16, 16, 256), (1, 8, 8, 64), (3, 4, 4, 32)]
    )
    def test_matches_xla(self, shape):
        b, h, w, c = shape
        x = jax.random.normal(jax.random.key(0), shape, jnp.float32) * 2 + 0.3
        scale = jax.random.normal(jax.random.key(1), (c,)) * 0.2 + 1.0
        bias = jax.random.normal(jax.random.key(2), (c,)) * 0.2
        ref = P.silu(P.group_norm(x, {"scale": scale, "bias": bias}, num_groups=8))
        out = K.gn_silu(x, scale, bias, num_groups=8)
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(out), rtol=1e-5, atol=1e-5
        )

    def test_bf16_io(self):
        x = jax.random.normal(jax.random.key(0), (1, 8, 8, 32), jnp.bfloat16)
        scale = jnp.ones((32,), jnp.bfloat16)
        bias = jnp.zeros((32,), jnp.bfloat16)
        out = K.gn_silu(x, scale, bias, num_groups=8)
        assert out.dtype == jnp.bfloat16
        ref = P.silu(
            P.group_norm(x, {"scale": scale, "bias": bias}, num_groups=8)
        )
        np.testing.assert_allclose(
            np.asarray(ref, np.float32), np.asarray(out, np.float32),
            rtol=2e-2, atol=2e-2,
        )


class TestAttentionBlock:
    def test_matches_xla(self):
        c = 256
        x = jax.random.normal(jax.random.key(0), (2, 16, 16, c), jnp.float32)
        p = {
            "norm": groupnorm_init(c),
            "qkv": dense_init(jax.random.key(3), c, 3 * c),
            "proj": dense_init(jax.random.key(4), c, c),
        }
        ref = P.spatial_attention(x, p, num_heads=4, num_groups=8)
        out = K.attention_block(x, p, num_heads=4, num_groups=8)
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(out), rtol=1e-4, atol=1e-4
        )

    def test_residual_identity_with_zero_proj(self):
        """Zero projection weights => output == input (residual path)."""
        c = 64
        x = jax.random.normal(jax.random.key(0), (1, 4, 4, c), jnp.float32)
        p = {
            "norm": groupnorm_init(c),
            "qkv": dense_init(jax.random.key(1), c, 3 * c),
            "proj": {
                "w": jnp.zeros((c, c), jnp.float32),
                "b": jnp.zeros((c,), jnp.float32),
            },
        }
        out = K.attention_block(x, p, num_heads=4, num_groups=8)
        np.testing.assert_allclose(np.asarray(x), np.asarray(out), atol=1e-6)


class TestFusedDispatch:
    def test_xla_fallback_on_cpu(self):
        """On the CPU backend, fused.gn_silu must route to XLA (no Pallas)."""
        from rectified_flow_vision_tpu.ops import fused

        assert not fused.pallas_available()  # conftest forces CPU
        x = jax.random.normal(jax.random.key(0), (1, 8, 8, 32))
        p = groupnorm_init(32)
        out = fused.gn_silu(x, p, num_groups=8, use_pallas=True)  # still XLA
        ref = P.silu(P.group_norm(x, p, num_groups=8))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)

    def test_custom_vjp_grads_flow(self):
        """Gradients flow through the custom_vjp wrapper (XLA backward)."""
        from rectified_flow_vision_tpu.ops import fused

        x = jax.random.normal(jax.random.key(0), (1, 4, 4, 16))
        p = groupnorm_init(16)

        def loss(x, p):
            return jnp.sum(fused.gn_silu(x, p, num_groups=8) ** 2)

        g = jax.grad(loss)(x, p)
        assert np.isfinite(np.asarray(g)).all()
