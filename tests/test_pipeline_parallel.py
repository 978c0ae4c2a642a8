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


class TestPipelineTraining:
    """GPipe training: grads through the staged mesh == sequential grads."""

    def _flow_batch(self, key, b=8):
        k0, k1, kt = jax.random.split(key, 3)
        x1 = jax.random.normal(k0, (b, 8, 8, 4))
        x0 = jax.random.normal(k1, (b, 8, 8, 4))
        t = jax.random.uniform(kt, (b,))
        return x1, x0, t

    def test_grads_match_sequential(self, stage_mesh):
        from rectified_flow_vision_tpu.parallel.pipeline import (
            make_pipeline_train_step,
            split_pipeline_params,
        )
        import optax

        dit, params = _perturbed_dit(depth=4)
        x1, x0, t = self._flow_batch(jax.random.key(5))

        def seq_loss(p, x1, x0, t):
            tb = t[:, None, None, None]
            x_t = (1.0 - tb) * x0 + tb * x1
            pred = dit.apply(p, x_t, t)
            return jnp.mean(jnp.square(pred - (x1 - x0)))

        grads_seq = jax.grad(seq_loss)(params, x1, x0, t)

        tx = optax.sgd(1e-3)
        _, pp_loss = make_pipeline_train_step(dit, tx, stage_mesh)
        rest, blocks = split_pipeline_params(params, stage_mesh)
        g_rest, g_blocks = jax.grad(pp_loss, argnums=(0, 1))(
            rest, blocks, x1, x0, t
        )

        # non-block grads match directly
        for k in g_rest:
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
                ),
                g_rest[k],
                grads_seq[k],
            )
        # block grads: restack the sequential ones into [S, L/S, ...]
        want_blocks = stack_block_params(grads_seq["blocks"], 4)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
            ),
            want_blocks,
            g_blocks,
        )

    def test_train_steps_reduce_loss(self, stage_mesh):
        from rectified_flow_vision_tpu.parallel.pipeline import (
            make_pipeline_train_step,
            merge_pipeline_params,
            split_pipeline_params,
        )
        import optax

        dit, params = _perturbed_dit(depth=4)
        tx = optax.adamw(1e-3)
        step, loss_fn = make_pipeline_train_step(dit, tx, stage_mesh)
        rest, blocks = split_pipeline_params(params, stage_mesh)
        opt_state = tx.init((rest, blocks))

        x1 = jax.random.normal(jax.random.key(9), (8, 8, 8, 4))
        losses = []
        for i in range(8):
            rest, blocks, opt_state, loss = step(
                rest, blocks, opt_state, x1, jax.random.key(i)
            )
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]

        # merged params still drive the plain (non-pipelined) forward
        merged = merge_pipeline_params(rest, blocks)
        out = dit.apply(merged, x1, jnp.full((8,), 0.5))
        assert np.isfinite(np.asarray(out)).all()

    def test_merge_roundtrip(self, stage_mesh):
        from rectified_flow_vision_tpu.parallel.pipeline import (
            merge_pipeline_params,
            split_pipeline_params,
        )

        _, params = _perturbed_dit(depth=4)
        rest, blocks = split_pipeline_params(params, stage_mesh)
        merged = merge_pipeline_params(rest, blocks)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            params,
            merged,
        )
