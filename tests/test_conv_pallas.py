"""Pallas direct-conv kernel equivalence tests (interpret mode on CPU).

The kernel targets the sampler's hot 3x3/stride-1 convs (reference conv
sites: models/unet.py res-blocks); ground truth is the XLA conv in
ops.primitives.conv2d. On TPU the same assertions hold compiled
(exercised by the benchmark path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectified_flow_vision_tpu.ops import conv_pallas as CP
from rectified_flow_vision_tpu.ops import pallas_kernels as K
from rectified_flow_vision_tpu.ops import primitives as P


@pytest.fixture(autouse=True)
def interpret_mode():
    K.set_interpret(True)
    yield
    K.set_interpret(False)


def _mk(shape, wshape, seed=0):
    kx, kw, kb = jax.random.split(jax.random.key(seed), 3)
    x = jax.random.normal(kx, shape, jnp.float32)
    w = jax.random.normal(kw, wshape, jnp.float32) * 0.1
    b = jax.random.normal(kb, (wshape[-1],), jnp.float32)
    return x, w, b


class TestConv3x3:
    @pytest.mark.parametrize(
        "shape,cout",
        [
            ((2, 16, 8, 64), 64),
            ((1, 8, 8, 64), 128),
            ((1, 8, 16, 128), 128),
            ((3, 12, 8, 64), 64),
        ],
    )
    def test_matches_xla(self, shape, cout):
        x, w, b = _mk(shape, (3, 3, shape[-1], cout))
        ref = P.conv2d(x, {"w": w, "b": b})
        out = CP.conv3x3(x, w, b)
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(out), rtol=1e-4, atol=1e-4
        )

    @pytest.mark.parametrize(
        "variant", ["patch", "taps", "packed", "image", "imagepacked"]
    )
    @pytest.mark.parametrize("shape,cout", [((2, 16, 8, 64), 64),
                                            ((1, 8, 16, 128), 128)])
    def test_variants_match_xla(self, shape, cout, variant):
        """All five kernel strategies (docs/DESIGN.md A/B table) compute
        the same conv."""
        x, w, b = _mk(shape, (3, 3, shape[-1], cout))
        ref = P.conv2d(x, {"w": w, "b": b})
        out = CP.conv3x3(x, w, b, variant=variant)
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(out), rtol=1e-4, atol=1e-4
        )

    def test_bf16_io(self):
        x, w, b = _mk((2, 8, 8, 64), (3, 3, 64, 64))
        out = CP.conv3x3(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), b)
        assert out.dtype == jnp.bfloat16
        ref = P.conv2d(x.astype(jnp.bfloat16), {"w": w, "b": b})
        np.testing.assert_allclose(
            np.asarray(out, dtype=np.float32),
            np.asarray(ref, dtype=np.float32),
            rtol=0.1, atol=0.1,
        )

    def test_supports_gate(self):
        assert CP.supports((256, 64, 64, 64), (3, 3, 64, 64), 1)
        assert CP.supports((8, 32, 32, 128), (3, 3, 128, 128), 1)
        assert not CP.supports((8, 64, 64, 64), (3, 3, 64, 64), 2)  # stride
        assert not CP.supports((8, 64, 64, 3), (3, 3, 3, 64), 1)  # cin=3
        assert not CP.supports((8, 64, 64, 64), (1, 1, 64, 64), 1)  # 1x1
        assert not CP.supports((8, 64, 64, 64), (3, 3, 64, 3), 1)  # cout=3

    def test_grad_matches_xla(self):
        from rectified_flow_vision_tpu.ops import fused as F

        x, w, b = _mk((1, 8, 8, 64), (3, 3, 64, 64))

        def loss_pallas(x, w, b):
            return jnp.sum(F.conv2d_fused(x, {"w": w, "b": b}, use_pallas=True) ** 2)

        def loss_xla(x, w, b):
            return jnp.sum(P.conv2d(x, {"w": w, "b": b}) ** 2)

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, w, b)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(x, w, b)
        for a, c in zip(gp, gx):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-4
            )
