"""Device-mesh construction and sharding rules.

The reference is strictly single-process / single-device (reference:
models/base_flow.py:46, main.py:93 — a bare cuda-or-cpu device string, no
torch.distributed anywhere). Parallelism here is therefore a from-scratch
TPU-native design, not a port:

* one ``jax.sharding.Mesh`` with axes ``('data', 'model')`` is the sole
  parallelism abstraction — batch parallel over ``data``, tensor parallel
  over ``model`` (out-channel / attention-head sharding),
* all collectives are emitted by the GSPMD partitioner from sharding
  annotations; the framework never issues raw collectives,
* multi-host: ``jax.distributed.initialize()`` + the same mesh over all
  processes' devices (ICI within a slice, DCN across slices, chosen by XLA
  from mesh placement).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


_DISTRIBUTED_INITIALIZED = False


def maybe_init_distributed() -> bool:
    """Initialise multi-host JAX when launched under a cluster scheduler.

    Must run BEFORE anything touches the XLA backend (jax.devices(),
    jax.process_count(), any computation) — jax.distributed.initialize()
    raises once backends are up. Call this first thing in entry points;
    returns True when multi-host init actually happened.
    """
    import os

    global _DISTRIBUTED_INITIALIZED
    if _DISTRIBUTED_INITIALIZED:
        return True
    if not (
        "JAX_COORDINATOR_ADDRESS" in os.environ
        or "COORDINATOR_ADDRESS" in os.environ
    ):
        return False
    try:
        jax.distributed.initialize()
        _DISTRIBUTED_INITIALIZED = True
        return True
    except (RuntimeError, ValueError) as exc:
        # ValueError covers stale/incomplete coordinator env vars on
        # non-cluster machines ("Number of processes must be defined.")
        import logging

        logging.getLogger("flow_vision").warning(
            "jax.distributed.initialize() failed (%s); continuing single-host",
            exc,
        )
        return False


def create_mesh(
    data_axis: int = -1,
    model_axis: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh.

    ``data_axis == -1`` consumes all devices not used by ``model_axis``.
    Device order follows ``jax.devices()`` so the model axis lands on
    ICI-adjacent chips (jax orders devices by interconnect locality).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model_axis < 1 or n % model_axis != 0:
        raise ValueError(f"model_axis={model_axis} must divide device count {n}")
    dp = n // model_axis if data_axis == -1 else data_axis
    if dp * model_axis != n:
        raise ValueError(
            f"mesh {dp}x{model_axis} does not cover {n} devices"
        )
    dev_array = np.asarray(devices).reshape(dp, model_axis)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over 'data'; everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch) -> jax.Array:
    """Place a host batch onto the mesh, sharded over the data axis."""
    return jax.device_put(batch, batch_sharding(mesh))


# ---------------------------------------------------------------------------
# Tensor-parallel sharding rules for the UNet param tree
# ---------------------------------------------------------------------------

# Param paths (joined with '/') matched against these regexes, first hit wins.
# Conv kernels are HWIO: shard the Out channel. Dense kernels are (In, Out).
# Norm scale/bias and biases follow the out-channel sharding of their layer.
_TP_RULES = [
    # --- UNet -------------------------------------------------------------
    # attention qkv/proj dense: shard heads via the out dim of qkv, in dim of proj
    (re.compile(r".*mid_attn/qkv/w$"), P(None, MODEL_AXIS)),
    (re.compile(r".*mid_attn/qkv/b$"), P(MODEL_AXIS)),
    (re.compile(r".*mid_attn/proj/w$"), P(MODEL_AXIS, None)),
    # time-embedding MLP: shard the 4C hidden dim
    (re.compile(r".*time_mlp/lin1/w$"), P(None, MODEL_AXIS)),
    (re.compile(r".*time_mlp/lin1/b$"), P(MODEL_AXIS)),
    (re.compile(r".*time_mlp/lin2/w$"), P(MODEL_AXIS, None)),
    # res-block convs, Megatron pattern (convs hold the bulk of UNet FLOPs
    # and params): conv1 column-parallel (HWIO Out channel), the block's
    # norm2 affine + additive time bias follow the sharded channels, conv2
    # row-parallel (HWIO In channel) with the psum emitted by GSPMD. The
    # 8 GroupNorm groups stay shard-local for model_axis in {2,4,8}.
    (re.compile(r".*(?:_blocks/[^/]+|mid_block\d)/conv1/w$"),
     P(None, None, None, MODEL_AXIS)),
    (re.compile(r".*(?:_blocks/[^/]+|mid_block\d)/conv1/b$"), P(MODEL_AXIS)),
    (re.compile(r".*(?:_blocks/[^/]+|mid_block\d)/norm2/(?:scale|bias)$"),
     P(MODEL_AXIS)),
    (re.compile(r".*(?:_blocks/[^/]+|mid_block\d)/conv2/w$"),
     P(None, None, MODEL_AXIS, None)),
    # res-block time projections: column-parallel so the bias aligns with
    # conv1's sharded Out channels
    (re.compile(r".*/time/w$"), P(None, MODEL_AXIS)),
    (re.compile(r".*/time/b$"), P(MODEL_AXIS)),
    # --- DiT (Megatron-style: column-parallel in, row-parallel out) --------
    (re.compile(r".*blocks/\d+/qkv/w$"), P(None, MODEL_AXIS)),
    (re.compile(r".*blocks/\d+/qkv/b$"), P(MODEL_AXIS)),
    (re.compile(r".*blocks/\d+/proj/w$"), P(MODEL_AXIS, None)),
    (re.compile(r".*blocks/\d+/mlp1/w$"), P(None, MODEL_AXIS)),
    (re.compile(r".*blocks/\d+/mlp1/b$"), P(MODEL_AXIS)),
    (re.compile(r".*blocks/\d+/mlp2/w$"), P(MODEL_AXIS, None)),
]


def unet_param_spec(path: str, ndim: int) -> P:
    """PartitionSpec for one UNet parameter under tensor parallelism.

    Residual-block convs shard Megatron-style (conv1 column / conv2 row
    over the HWIO channel dims) together with the norm2 affine and time
    bias that act on the sharded channels; attention and the time MLP
    shard as matmuls. Downsample/upsample/shortcut/head convs (one per
    level, small) and norm1 stay replicated. DiT blocks shard
    column/row per block.
    """
    for pattern, spec in _TP_RULES:
        if pattern.match(path):
            return spec
    return P()


def make_param_shardings(mesh: Mesh, params: Dict[str, Any]):
    """Build a sharding pytree for a UNet param tree."""
    from rectified_flow_vision_tpu.utils.checkpoint import flatten_tree, unflatten_tree

    flat = flatten_tree(params)
    specs = {
        path: NamedSharding(mesh, unet_param_spec(path, arr.ndim))
        for path, arr in flat.items()
    }
    return unflatten_tree(specs)


def shard_params(mesh: Mesh, params):
    """Place params on the mesh (TP-sharded where rules apply, else replicated)."""
    from rectified_flow_vision_tpu.utils.checkpoint import flatten_tree, unflatten_tree

    flat = flatten_tree(params)
    placed = {
        path: jax.device_put(
            arr, NamedSharding(mesh, unet_param_spec(path, arr.ndim))
        )
        for path, arr in flat.items()
    }
    return unflatten_tree(placed)


# ---------------------------------------------------------------------------
# FSDP (ZeRO-style) parameter + optimizer-state sharding over the data axis
# ---------------------------------------------------------------------------
#
# The scaling-book "fully sharded" recipe, GSPMD-style: every parameter
# (and its Adam moments) is stored sharded over the 'data' axis — each
# chip holds 1/dp of the weights and optimizer state — and the train step
# is annotated with those shardings. XLA's partitioner then emits the
# all-gather before each layer's use and the reduce-scatter on the
# gradients; the framework never writes a collective. Composes with the
# tensor-parallel rules above (a param already sharded over 'model' on one
# dim additionally shards over 'data' on another).


def fsdp_spec(shape, dp: int, base: Optional[P] = None) -> P:
    """Add DATA_AXIS sharding on the largest free dim divisible by ``dp``.

    ``base`` is an existing (e.g. tensor-parallel) PartitionSpec whose
    axes are preserved; scalars and shapes with no divisible free dim stay
    as-is (replicated over 'data').
    """
    parts = list(base) if base is not None else []
    parts += [None] * (len(shape) - len(parts))
    best = None
    for i, d in enumerate(shape):
        if parts[i] is not None or d % dp != 0 or d < dp:
            continue
        if best is None or shape[i] > shape[best]:
            best = i
    if best is not None:
        parts[best] = DATA_AXIS
    return P(*parts)


def make_fsdp_param_shardings(mesh: Mesh, params, *, tp: bool = True):
    """Sharding pytree congruent to ``params``: FSDP over 'data' composed
    with the TP rules over 'model' (when ``tp``)."""
    from rectified_flow_vision_tpu.utils.checkpoint import flatten_tree, unflatten_tree

    dp = mesh.shape[DATA_AXIS]
    flat = flatten_tree(params)
    specs = {}
    for path, arr in flat.items():
        base = unet_param_spec(path, arr.ndim) if tp else P()
        specs[path] = NamedSharding(mesh, fsdp_spec(arr.shape, dp, base))
    return unflatten_tree(specs)


def shard_params_fsdp(mesh: Mesh, params, *, tp: bool = True):
    """Place params fully sharded over 'data' (+ TP over 'model')."""
    shardings = make_fsdp_param_shardings(mesh, params, tp=tp)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def shard_opt_state(mesh: Mesh, opt_state, params, param_shardings):
    """Place an optax state tree: param-structured subtrees (Adam mu/nu)
    inherit the param shardings, everything else (step counts, empty
    states) replicates."""
    pdef = jax.tree_util.tree_structure(params)
    rep = replicated(mesh)
    # a degenerate single-leaf params tree would structurally match every
    # scalar optimizer node (e.g. Adam's step count) — never spec-match then
    pdef_is_leaf = jax.tree_util.treedef_is_leaf(pdef)

    def place(node):
        try:
            if not pdef_is_leaf and jax.tree_util.tree_structure(node) == pdef:
                return jax.tree_util.tree_map(
                    jax.device_put, node, param_shardings
                )
        except Exception:  # noqa: BLE001 - non-pytree nodes fall through
            pass
        if hasattr(node, "_fields"):  # optax NamedTuple state
            return type(node)(*(place(child) for child in node))
        if isinstance(node, (tuple, list)):
            return type(node)(place(child) for child in node)
        return jax.device_put(node, rep)

    return place(opt_state)


def place_params(mesh: Optional[Mesh], params, *, fsdp: bool = False):
    """Place a param pytree: FSDP-sharded over 'data' or TP/replicated."""
    if mesh is None:
        return params
    return shard_params_fsdp(mesh, params) if fsdp else shard_params(mesh, params)


def place_train_state(mesh: Optional[Mesh], params, opt_state, *, fsdp: bool = False):
    """Place (params, opt_state) on the mesh: TP-sharded/replicated for
    plain DP(+TP), or fully sharded over 'data' under FSDP (ZeRO-style;
    GSPMD emits the per-layer all-gathers and grad reduce-scatters).
    The shared placement helper used by both trainers."""
    if mesh is None:
        return params, opt_state
    params = place_params(mesh, params, fsdp=fsdp)
    if fsdp:
        opt_state = shard_opt_state(
            mesh, opt_state, params, make_fsdp_param_shardings(mesh, params)
        )
    else:
        opt_state = jax.device_put(opt_state, replicated(mesh))
    return params, opt_state
