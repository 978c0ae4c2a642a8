"""Pipeline-parallel (GPipe) correctness on the fake 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from rectified_flow_vision_tpu.models.dit import DiT
from rectified_flow_vision_tpu.parallel.pipeline import (
    pipeline_apply,
    shard_stage_params,
    stack_block_params,
)

pytestmark = pytest.mark.slow  # heavy: training loops / e2e / multi-device jit


@pytest.fixture(scope="module")
def stage_mesh(eight_devices):
    import numpy as onp

    return Mesh(onp.asarray(eight_devices[:4]).reshape(4), ("stage",))


def _perturbed_dit(depth=4):
    dit = DiT(
        input_size=8, patch_size=2, in_channels=4,
        hidden_size=32, depth=depth, num_heads=4,
    )
    params = dit.init(jax.random.key(0))
    # perturb so blocks are non-identity (adaLN-zero init would hide bugs)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jax.random.normal(jax.random.key(7), a.shape, a.dtype),
        params,
    )
    return dit, params


class TestStackParams:
    def test_stack_shape(self):
        _, params = _perturbed_dit(depth=4)
        stacked = stack_block_params(params["blocks"], 2)
        leaf = stacked["qkv"]["w"]
        assert leaf.shape[:2] == (2, 2)  # [S, L/S, ...]

    def test_indivisible_raises(self):
        _, params = _perturbed_dit(depth=4)
        with pytest.raises(ValueError):
            stack_block_params(params["blocks"], 3)


class TestPipelineForward:
    @pytest.mark.parametrize("num_microbatches", [2, 4, 8])
    def test_matches_sequential(self, stage_mesh, num_microbatches):
        dit, params = _perturbed_dit(depth=4)
        x = jax.random.normal(jax.random.key(1), (8, 8, 8, 4))
        t = jnp.linspace(0.1, 0.9, 8)

        want = np.asarray(dit.apply(params, x, t))
        got = np.asarray(
            jax.jit(
                lambda p, x, t: dit.pipeline_apply(
                    p, x, t, stage_mesh, num_microbatches=num_microbatches
                )
            )(params, x, t)
        )
        np.testing.assert_allclose(want, got, rtol=2e-4, atol=2e-4)

    def test_presharded_stage_params(self, stage_mesh):
        dit, params = _perturbed_dit(depth=4)
        stacked = shard_stage_params(
            stage_mesh, stack_block_params(params["blocks"], 4)
        )
        x = jax.random.normal(jax.random.key(2), (4, 8, 8, 4))
        t = jnp.full((4,), 0.5)
        want = np.asarray(dit.apply(params, x, t))
        got = np.asarray(
            dit.pipeline_apply(
                params, x, t, stage_mesh, stacked_blocks=stacked,
                num_microbatches=2,
            )
        )
        np.testing.assert_allclose(want, got, rtol=2e-4, atol=2e-4)

    def test_bad_microbatch_count_raises(self, stage_mesh):
        dit, params = _perturbed_dit(depth=4)
        x = jnp.zeros((6, 8, 8, 4))
        t = jnp.zeros((6,))
        with pytest.raises(ValueError):
            dit.pipeline_apply(params, x, t, stage_mesh, num_microbatches=4)
