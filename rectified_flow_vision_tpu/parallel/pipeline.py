"""Pipeline parallelism: GPipe-style microbatch pipelining over a mesh axis.

The reference is single-device (SURVEY §2.3); this adds the last of the
classic parallelism modes for the transformer family. DiT's depth-L block
stack is split into S equal stages, one per device along the ``stage`` mesh
axis. Microbatches flow through the ring: at tick t, stage s processes
microbatch t-s; activations (and their time-conditioning embeddings) hop to
the next stage with ``ppermute`` after every tick. The schedule runs
M + S - 1 ticks with the usual GPipe bubbles; collection happens on the
last stage and is broadcast back with one psum.

All indices are static (the tick loop is a Python loop under jit), so the
whole pipeline compiles into one XLA executable with S-way SPMD.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array
Params = Dict[str, Any]


def stack_block_params(block_params: Dict[str, Params], num_stages: int) -> Params:
    """{'0': blk, '1': blk, ...} -> leaves stacked [S, L/S, ...].

    Blocks must be homogeneous (same pytree structure), which DiT's are.
    """
    n = len(block_params)
    if n % num_stages != 0:
        raise ValueError(f"{n} blocks not divisible into {num_stages} stages")
    per = n // num_stages
    ordered = [block_params[str(i)] for i in range(n)]

    def stack(*leaves):
        flat = jnp.stack(leaves)  # [L, ...]
        return flat.reshape((num_stages, per) + flat.shape[1:])

    return jax.tree_util.tree_map(stack, *ordered)


def shard_stage_params(mesh: Mesh, stacked: Params, stage_axis: str = "stage"):
    """Place stacked block params with dim0 sharded over the stage axis."""
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(
            a, NamedSharding(mesh, P(stage_axis, *([None] * (a.ndim - 1))))
        ),
        stacked,
    )


def pipeline_apply(
    block_fn: Callable[[Params, Array, Array], Array],
    stacked_params: Params,
    tokens: Array,
    c_emb: Array,
    mesh: Mesh,
    *,
    stage_axis: str = "stage",
    num_microbatches: int = None,
) -> Array:
    """Run token activations through the pipelined block stack.

    block_fn(one_block_params, tokens_mb, c_emb_mb) -> tokens_mb.
    tokens: [B, T, H]; c_emb: [B, H]. B must divide into microbatches that
    each keep a static shape. Returns [B, T, H].
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    num_stages = mesh.shape[stage_axis]
    m = num_microbatches or num_stages
    b = tokens.shape[0]
    if b % m != 0:
        raise ValueError(f"batch {b} not divisible into {m} microbatches")
    mb = b // m

    x_mb = tokens.reshape((m, mb) + tokens.shape[1:])
    c_mb = c_emb.reshape((m, mb) + c_emb.shape[1:])

    def _stage(params_local, x):
        # params_local leaves: [1, per, ...] (the local stage's blocks)
        tokens_mb, c = x

        def body(tok, blk):
            return block_fn(blk, tok, c), None

        per_stage = jax.tree_util.tree_map(lambda a: a[0], params_local)
        tokens_mb, _ = jax.lax.scan(body, tokens_mb, per_stage)
        return tokens_mb, c

    def _pipelined(params_local, x_mb, c_mb):
        stage = jax.lax.axis_index(stage_axis)
        s_count = num_stages
        perm = [(i, (i + 1) % s_count) for i in range(s_count)]

        state = jnp.zeros_like(x_mb[0])
        c_state = jnp.zeros_like(c_mb[0])
        out = jnp.zeros_like(x_mb)

        is_first = (stage == 0)
        is_last = (stage == s_count - 1)

        for t in range(m + s_count - 1):
            # stage 0 injects microbatch t before processing
            if t < m:
                state = jnp.where(is_first, x_mb[t], state)
                c_state = jnp.where(is_first, c_mb[t], c_state)
            state, c_state = _stage(params_local, (state, c_state))
            # last stage collects microbatch t-(S-1) after processing
            out_idx = t - (s_count - 1)
            if out_idx >= 0:
                out = out.at[out_idx].set(
                    jnp.where(is_last, state, out[out_idx])
                )
            # hop to the next stage
            if t < m + s_count - 2:
                state = jax.lax.ppermute(state, stage_axis, perm)
                c_state = jax.lax.ppermute(c_state, stage_axis, perm)

        # only the last stage holds results; one psum broadcasts them
        out = jnp.where(is_last, out, jnp.zeros_like(out))
        return jax.lax.psum(out, stage_axis)

    spec_params = jax.tree_util.tree_map(
        lambda a: P(stage_axis, *([None] * (a.ndim - 1))), stacked_params
    )
    fn = shard_map(
        _pipelined,
        mesh=mesh,
        in_specs=(spec_params, P(), P()),
        out_specs=P(),
    )
    out = fn(stacked_params, x_mb, c_mb)
    return out.reshape((b,) + tokens.shape[1:])


# ---- pipeline-parallel TRAINING -------------------------------------------
#
# The pipelined forward above is built from differentiable collectives
# (ppermute's transpose is ppermute with the inverted permutation, psum's
# is broadcast), so jax.grad through it IS GPipe training: the backward
# pass pipelines the cotangents stage-to-stage in the reverse schedule,
# with XLA holding each tick's activations (or recomputing them under
# jax.checkpoint). No hand-written backward schedule is needed — the
# schedule is the transpose of the forward one.


def split_pipeline_params(params: Params, mesh: Mesh, stage_axis: str = "stage"):
    """Full DiT params -> (rest, stacked_blocks) in pipeline layout.

    ``rest`` is everything outside the block stack (patchify, pos-embed,
    time MLP, final head) and stays replicated; block params are stacked
    to [S, L/S, ...] and sharded over the stage axis.
    """
    rest = {k: v for k, v in params.items() if k != "blocks"}
    stacked = shard_stage_params(
        mesh, stack_block_params(params["blocks"], mesh.shape[stage_axis]),
        stage_axis,
    )
    return rest, stacked


def merge_pipeline_params(rest: Params, stacked: Params) -> Params:
    """Inverse of split_pipeline_params (for checkpointing / sampling)."""
    num_stages = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    per = jax.tree_util.tree_leaves(stacked)[0].shape[1]
    blocks = {}
    for i in range(num_stages * per):
        s, j = divmod(i, per)
        blocks[str(i)] = jax.tree_util.tree_map(lambda a: a[s, j], stacked)
    return {**rest, "blocks": blocks}


def make_pipeline_train_step(
    dit,
    tx,
    mesh: Mesh,
    *,
    stage_axis: str = "stage",
    num_microbatches: int = None,
    compute_dtype=jnp.float32,
):
    """Jitted flow-matching train step through the staged block stack.

    Arguments mirror ``models.base_flow.make_train_step`` but the params
    travel in pipeline layout (rest, stacked_blocks) — see
    ``split_pipeline_params``. Gradient averaging over any data axis and
    the stage-sharded block updates are both emitted by GSPMD.
    """
    import functools

    import optax

    def loss_fn(rest, blocks, x1, x0, t):
        tb = t[:, None, None, None].astype(jnp.float32)
        x_t = (1.0 - tb) * x0 + tb * x1
        target = (x1 - x0).astype(jnp.float32)
        pred = dit.pipeline_apply(
            rest,
            x_t,
            t,
            mesh,
            stacked_blocks=blocks,
            stage_axis=stage_axis,
            num_microbatches=num_microbatches,
            compute_dtype=compute_dtype,
        )
        return jnp.mean(jnp.square(pred.astype(jnp.float32) - target))

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(rest, blocks, opt_state, x1, rng):
        k0, kt = jax.random.split(jax.random.fold_in(rng, 0))
        x0 = jax.random.normal(k0, x1.shape, jnp.float32)
        t = jax.random.uniform(kt, (x1.shape[0],), jnp.float32)
        loss_val, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            rest, blocks, x1.astype(jnp.float32), x0, t
        )
        updates, opt_state = tx.update(grads, opt_state, (rest, blocks))
        rest, blocks = optax.apply_updates((rest, blocks), updates)
        return rest, blocks, opt_state, loss_val

    return train_step, loss_fn
