"""Ring-attention correctness on the fake 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectified_flow_vision_tpu.parallel import mesh as mesh_lib
from rectified_flow_vision_tpu.parallel.ring_attention import (
    reference_attention,
    ring_attention_sharded,
)
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

pytestmark = pytest.mark.slow  # heavy: training loops / e2e / multi-device jit


@pytest.fixture(scope="module")
def seq_mesh(eight_devices):
    import numpy as onp

    return Mesh(onp.asarray(eight_devices).reshape(1, 8), ("data", "seq"))


class TestRingAttention:
    @pytest.mark.parametrize("t,h,d", [(64, 4, 16), (128, 2, 32)])
    def test_matches_reference(self, seq_mesh, t, h, d):
        key = jax.random.key(0)
        kq, kk, kv = jax.random.split(key, 3)
        b = 2
        q = jax.random.normal(kq, (b, t, h, d), jnp.float32)
        k = jax.random.normal(kk, (b, t, h, d), jnp.float32)
        v = jax.random.normal(kv, (b, t, h, d), jnp.float32)

        want = np.asarray(reference_attention(q, k, v))

        spec = NamedSharding(seq_mesh, P(None, "seq", None, None))
        qs, ks, vs = (jax.device_put(x, spec) for x in (q, k, v))
        got = np.asarray(
            jax.jit(
                lambda a, b_, c: ring_attention_sharded(a, b_, c, seq_mesh)
            )(qs, ks, vs)
        )
        np.testing.assert_allclose(want, got, rtol=2e-5, atol=2e-5)

    def test_extreme_logits_stable(self, seq_mesh):
        """Online-softmax merge must stay finite with large-magnitude scores."""
        key = jax.random.key(1)
        q = jax.random.normal(key, (1, 64, 2, 16), jnp.float32) * 30
        k = jax.random.normal(jax.random.fold_in(key, 1), (1, 64, 2, 16)) * 30
        v = jax.random.normal(jax.random.fold_in(key, 2), (1, 64, 2, 16))
        spec = NamedSharding(seq_mesh, P(None, "seq", None, None))
        qs, ks, vs = (jax.device_put(x, spec) for x in (q, k, v))
        got = np.asarray(ring_attention_sharded(qs, ks, vs, seq_mesh))
        assert np.isfinite(got).all()
        want = np.asarray(reference_attention(q, k, v))
        np.testing.assert_allclose(want, got, rtol=1e-4, atol=1e-4)

    def test_output_stays_sharded(self, seq_mesh):
        q = jnp.zeros((1, 64, 2, 16))
        spec = NamedSharding(seq_mesh, P(None, "seq", None, None))
        qs = jax.device_put(q, spec)
        out = jax.jit(
            lambda a: ring_attention_sharded(a, a, a, seq_mesh)
        )(qs)
        assert out.sharding.spec == P(None, "seq", None, None)
