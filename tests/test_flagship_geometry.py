"""Multi-chip correctness at the FLAGSHIP latent geometry (not toys).

Round-2 dryruns exercised sharding only on 16x16/depth-2 toy models; these
slow tests pin the dit256 production geometry — DiT-S/2 over 64x64x4
latents = 1024 tokens (configs/config_dit256.yaml) — on the fake 8-CPU-
device mesh: token-sharded ring attention training vs the unsharded
reference, and a depth-12 GPipe train step's gradients vs sequential.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

from rectified_flow_vision_tpu.models.dit import DiT

pytestmark = pytest.mark.slow  # full DiT-S fwd+bwd at 1024 tokens on CPU


LATENT = 64  # 64x64x4 latents -> (64/2)^2 = 1024 tokens at patch 2


def _dit_s(depth=12):
    """True DiT-S/2 geometry at the dit256 latent resolution."""
    dit = DiT(
        input_size=LATENT, patch_size=2, in_channels=4,
        hidden_size=384, depth=depth, num_heads=6,
    )
    params = dit.init(jax.random.key(0))
    # perturb adaLN-zero inits so every block transforms its input
    params = jax.tree_util.tree_map(
        lambda a: a + 0.02 * jax.random.normal(jax.random.key(7), a.shape, a.dtype),
        params,
    )
    return dit, params


def _flow_batch(batch):
    k0, k1, kt = jax.random.split(jax.random.key(3), 3)
    x1 = jax.random.normal(k1, (batch, LATENT, LATENT, 4), jnp.float32)
    x0 = jax.random.normal(k0, x1.shape, jnp.float32)
    t = jax.random.uniform(kt, (batch,), jnp.float32)
    return x1, x0, t


def _loss(dit, params, x1, x0, t, **apply_kw):
    tb = t[:, None, None, None]
    x_t = (1.0 - tb) * x0 + tb * x1
    pred = dit.apply(params, x_t, t, **apply_kw)
    return jnp.mean(jnp.square(pred.astype(jnp.float32) - (x1 - x0)))


def test_sp_ring_attention_dit_s_1024_tokens(eight_devices):
    """dp2 x seq4 ring-attention TRAIN gradients == unsharded, at 1024
    tokens (the dit256 sequence length)."""
    dit, params = _dit_s(depth=12)
    x1, x0, t = _flow_batch(batch=2)

    loss_ref, grads_ref = jax.value_and_grad(
        lambda p: _loss(dit, p, x1, x0, t)
    )(params)

    mesh = Mesh(np.asarray(eight_devices).reshape(2, 4), ("data", "seq"))
    x1s = jax.device_put(x1, NamedSharding(mesh, PS("data")))
    x0s = jax.device_put(x0, NamedSharding(mesh, PS("data")))
    loss_sp, grads_sp = jax.jit(
        jax.value_and_grad(
            lambda p, x1_, x0_: _loss(
                dit, p, x1_, x0_, t, mesh=mesh, seq_axis="seq"
            )
        )
    )(params, x1s, x0s)

    assert float(loss_sp) == pytest.approx(float(loss_ref), rel=2e-4)
    flat_ref = jax.tree_util.tree_leaves(grads_ref)
    flat_sp = jax.tree_util.tree_leaves(grads_sp)
    for a, b in zip(flat_ref, flat_sp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4
        )


def test_pp_gpipe_train_depth12_grads_match_sequential(eight_devices):
    """2-stage GPipe train-step gradients == sequential at depth 12 /
    1024 tokens (the dit256 block stack)."""
    import optax

    from rectified_flow_vision_tpu.parallel.pipeline import (
        make_pipeline_train_step,
        split_pipeline_params,
        stack_block_params,
    )

    dit, params = _dit_s(depth=12)
    x1, x0, t = _flow_batch(batch=2)
    mesh = Mesh(np.asarray(eight_devices[:2]).reshape(2), ("stage",))

    grads_seq = jax.grad(lambda p: _loss(dit, p, x1, x0, t))(params)

    tx = optax.sgd(1e-3)
    _, pp_loss = make_pipeline_train_step(dit, tx, mesh, num_microbatches=2)
    rest, blocks = split_pipeline_params(params, mesh)
    g_rest, g_blocks = jax.grad(pp_loss, argnums=(0, 1))(
        rest, blocks, x1, x0, t
    )

    for k in g_rest:
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4
            ),
            g_rest[k],
            grads_seq[k],
        )
    want_blocks = stack_block_params(grads_seq["blocks"], 2)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4
        ),
        want_blocks,
        g_blocks,
    )
