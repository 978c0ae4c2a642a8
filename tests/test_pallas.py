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


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="pltpu.prng_random_bits needs real TPU hardware (the CPU "
    "interpreter stubs it); exercised on TPU by tools/bench_train.py",
)
class TestDropoutKernels:
    """Hardware-PRNG dropout + fused gn_silu_dropout (TPU only)."""

    def test_dropout_stats_and_determinism(self):
        x = jnp.ones((8, 16, 16, 32), jnp.float32)  # 65536 elems
        seed = jnp.array([42], jnp.int32)
        y1 = K.dropout(x, seed, 0.25)
        y2 = K.dropout(x, seed, 0.25)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
        zero_frac = float(jnp.mean((y1 == 0).astype(jnp.float32)))
        assert abs(zero_frac - 0.25) < 0.02
        # kept elements are scaled by 1/keep
        kept = np.asarray(y1)[np.asarray(y1) != 0]
        np.testing.assert_allclose(kept, 1.0 / 0.75, rtol=1e-6)
        # different seed -> different mask
        y3 = K.dropout(x, jnp.array([43], jnp.int32), 0.25)
        assert not np.array_equal(np.asarray(y1), np.asarray(y3))

    def test_gn_silu_dropout_matches_masked_gn_silu(self):
        b, h, w, c = 3, 8, 8, 64
        x = jax.random.normal(jax.random.key(0), (b, h, w, c)) * 2 + 0.3
        scale = jax.random.normal(jax.random.key(1), (c,)) * 0.2 + 1.0
        bias = jax.random.normal(jax.random.key(2), (c,)) * 0.2
        seed = jnp.array([7], jnp.int32)
        rate = 0.2
        out = np.asarray(
            K.gn_silu_dropout(x, scale, bias, seed, rate, num_groups=8)
        )
        ref = np.asarray(
            P.silu(P.group_norm(x, {"scale": scale, "bias": bias}, num_groups=8))
        )
        mask = out != 0
        # kept entries equal gn_silu / keep; dropped fraction ~ rate
        np.testing.assert_allclose(
            out[mask], ref[mask] / (1 - rate), rtol=2e-5, atol=2e-5
        )
        assert abs((~mask).mean() - rate) < 0.03
        # the standalone mask-apply regenerates the identical mask
        g = jnp.ones_like(x)
        gm = np.asarray(K.dropout_mask_apply(g, seed, rate))
        np.testing.assert_array_equal(gm != 0, mask)

    def test_gn_silu_dropout_grads(self):
        """custom_vjp grads == grads of the equivalent masked XLA chain."""
        from rectified_flow_vision_tpu.ops import fused as F

        b, h, w, c = 2, 8, 8, 32
        x = jax.random.normal(jax.random.key(3), (b, h, w, c))
        p = {"scale": jnp.ones((c,)) * 1.1, "bias": jnp.zeros((c,)) + 0.05}
        seed = jnp.array([11], jnp.int32)
        rate = 0.3

        def fused_loss(x_, s_, b_):
            out = F._gn_silu_dropout_pallas(x_, s_, b_, seed, rate, 8)
            return jnp.sum(out * out)

        out = F._gn_silu_dropout_pallas(x, p["scale"], p["bias"], seed, rate, 8)
        mask = jnp.asarray(np.asarray(out) != 0, jnp.float32)

        def ref_loss(x_, s_, b_):
            ref = P.silu(P.group_norm(x_, {"scale": s_, "bias": b_}, num_groups=8))
            masked = ref * mask / (1 - rate)
            return jnp.sum(masked * masked)

        g_fused = jax.grad(fused_loss, argnums=(0, 1, 2))(x, p["scale"], p["bias"])
        g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(x, p["scale"], p["bias"])
        for a, b_ in zip(g_fused, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4
            )

    def test_eval_mode_is_plain_gn_silu(self):
        from rectified_flow_vision_tpu.ops import fused as F

        x = jax.random.normal(jax.random.key(4), (2, 8, 8, 32))
        p = {"scale": jnp.ones((32,)), "bias": jnp.zeros((32,))}
        out = F.gn_silu_dropout(x, p, 0.5, None, train=False, num_groups=8)
        ref = P.silu(P.group_norm(x, p, num_groups=8))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
        )


class TestPallasDropoutGate:
    """pallas_dropout tri-state: None => process default, explicit bool
    wins (use_pallas=False at the model level is a real kill switch)."""

    def _spy(self, monkeypatch):
        from rectified_flow_vision_tpu.ops import fused as F

        calls = []
        monkeypatch.setattr(F, "pallas_available", lambda: True)
        monkeypatch.setattr(
            F,
            "_gn_silu_dropout_pallas",
            lambda x, s, b, seed, rate, g: (calls.append(1), x)[1],
        )
        return F, calls

    def test_explicit_false_forces_xla(self, monkeypatch):
        F, calls = self._spy(monkeypatch)
        x = jnp.ones((2, 4, 4, 8))
        p = {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))}
        F.gn_silu_dropout(
            x, p, 0.1, jax.random.key(0), train=True, pallas_dropout=False
        )
        assert not calls
        F.gn_silu_dropout(
            x, p, 0.1, jax.random.key(0), train=True, pallas_dropout=True
        )
        assert calls

    def test_none_follows_process_default(self, monkeypatch):
        F, calls = self._spy(monkeypatch)
        x = jnp.ones((2, 4, 4, 8))
        p = {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))}
        monkeypatch.setattr(F, "_PALLAS_DROPOUT", False)
        F.gn_silu_dropout(x, p, 0.1, jax.random.key(0), train=True)
        assert not calls
        monkeypatch.setattr(F, "_PALLAS_DROPOUT", True)
        F.gn_silu_dropout(x, p, 0.1, jax.random.key(0), train=True)
        assert calls

    def test_model_level_kill_switch(self):
        from rectified_flow_vision_tpu.models import BaseFlowModel

        kw = dict(
            image_size=8, model_channels=16, channel_mult=[1],
            num_res_blocks=1, sample_dtype="float32",
        )
        assert BaseFlowModel(use_pallas=False, **kw).pallas_dropout is False
        assert BaseFlowModel(use_pallas=None, **kw).pallas_dropout is None


class TestShardedKernelTracing:
    """The shard_map wrapper must stay traceable across jax upgrades.

    jax 0.9's shard_map traces bodies with varying-manual-axes checking,
    which rejected pallas_call's un-annotated ShapeDtypeStruct outputs
    (ValueError: "vma ... must not be None") — a TPU-only runtime crash
    the CPU suite never saw. jax.eval_shape reproduces the failure at
    trace time on any backend, so this pins the fix (check_vma=False in
    _gn_silu_dropout_sharded) without needing the hardware PRNG.
    """

    def test_sharded_gn_silu_dropout_traces(self):
        from jax.sharding import Mesh

        from rectified_flow_vision_tpu.ops import fused as F

        mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
        x = jax.ShapeDtypeStruct((8, 8, 8, 32), jnp.float32)
        vec = jax.ShapeDtypeStruct((32,), jnp.float32)
        seed = jax.ShapeDtypeStruct((1,), jnp.int32)
        out = jax.eval_shape(
            lambda a, s, b, sd: F._gn_silu_dropout_sharded(
                a, s, b, sd, 0.1, 8, mesh, "data"
            ),
            x, vec, vec, seed,
        )
        assert out.shape == x.shape and out.dtype == x.dtype

    def test_sharded_gn_silu_dropout_traces_under_grad(self):
        from jax.sharding import Mesh

        from rectified_flow_vision_tpu.ops import fused as F

        mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
        x = jax.ShapeDtypeStruct((4, 8, 8, 32), jnp.float32)
        vec = jax.ShapeDtypeStruct((32,), jnp.float32)
        seed = jax.ShapeDtypeStruct((1,), jnp.int32)

        def loss(a, s, b, sd):
            o = F._gn_silu_dropout_sharded(a, s, b, sd, 0.1, 8, mesh, "data")
            return (o * o).sum()

        grads = jax.eval_shape(
            lambda a, s, b, sd: jax.grad(loss, argnums=(0, 1, 2))(a, s, b, sd),
            x, vec, vec, seed,
        )
        assert grads[0].shape == x.shape and grads[1].shape == vec.shape
