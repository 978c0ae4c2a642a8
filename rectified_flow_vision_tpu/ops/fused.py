"""Fused elementwise chains: dispatch between Pallas TPU kernels and XLA.

The hot per-layer chain in the UNet residual block is
GroupNorm -> SiLU (reference: models/unet.py:55-62, executed twice per block,
16 blocks + output head per forward). On TPU this chain is memory-bound;
fusing it into one Pallas kernel removes HBM round-trips between the norm
statistics pass and the activation. The XLA implementations in
``ops.primitives`` are the fallback (non-TPU backends) and the ground truth
for equivalence tests.

Training support: the Pallas forward is wrapped in ``jax.custom_vjp`` whose
backward is the XLA reference's VJP — correct gradients with a fused forward.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax

from rectified_flow_vision_tpu.ops import primitives as P

Array = jax.Array

_PALLAS_OK: Optional[bool] = None
_PALLAS_DROPOUT = True


def pallas_available() -> bool:
    """True when the TPU Pallas backend can be used."""
    global _PALLAS_OK
    if _PALLAS_OK is None:
        _PALLAS_OK = jax.default_backend() == "tpu"
    return _PALLAS_OK


def set_pallas_dropout(enabled: bool) -> None:
    """Process-wide default for the fused gn_silu+dropout kernel.

    This is only the DEFAULT: ``gn_silu_dropout``'s ``pallas_dropout``
    argument (threaded from ``BaseFlowModel``/the trainers) overrides it
    per call. Trainers scope their own override — mesh training passes
    ``pallas_dropout=False`` because GSPMD has no partitioning rule for
    pallas_call (sharded activations would be all-gathered around the
    kernel) — so this global is never mutated by the framework.
    """
    global _PALLAS_DROPOUT
    _PALLAS_DROPOUT = bool(enabled)


def pallas_dropout_enabled() -> bool:
    return _PALLAS_DROPOUT


def resolve_use_pallas(flag: Optional[bool]) -> bool:
    """None => auto-detect; explicit bool wins."""
    if flag is None:
        return pallas_available()
    return bool(flag)


# ---------------------------------------------------------------------------
# GroupNorm + SiLU
# ---------------------------------------------------------------------------


def _gn_silu_xla(x: Array, scale: Array, bias: Array, num_groups: int) -> Array:
    p = {"scale": scale, "bias": bias}
    return P.silu(P.group_norm(x, p, num_groups=num_groups))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gn_silu_pallas(x: Array, scale: Array, bias: Array, num_groups: int) -> Array:
    from rectified_flow_vision_tpu.ops import pallas_kernels as K

    return K.gn_silu(x, scale, bias, num_groups=num_groups)


def _gn_silu_fwd(x, scale, bias, num_groups):
    return _gn_silu_pallas(x, scale, bias, num_groups), (x, scale, bias)


def _gn_silu_bwd(num_groups, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda x_, s_, b_: _gn_silu_xla(x_, s_, b_, num_groups), x, scale, bias)
    return vjp(g)


_gn_silu_pallas.defvjp(_gn_silu_fwd, _gn_silu_bwd)


# Max per-image (H*W, C) slab size the single-pass gn_silu kernel may hold in
# VMEM. Mosaic double-buffers in/out blocks and keeps several fp32 temporaries
# (~8x the block), so blocks beyond ~1.5 MB blow the 16 MB scoped-VMEM limit
# (observed: 64x64x192 fp32 slab -> 23.97 MB scoped alloc). Larger slabs take
# the XLA path, whose own GN+SiLU fusion handles them without staging.
_GN_SILU_MAX_SLAB_BYTES = 1_572_864


def gn_silu(
    x: Array, p: dict, *, num_groups: int = 8, use_pallas: bool = False
) -> Array:
    """Fused GroupNorm(num_groups) + SiLU over an NHWC tensor."""
    slab_bytes = x.shape[1] * x.shape[2] * x.shape[3] * 4  # fp32 compute
    if use_pallas and pallas_available() and slab_bytes <= _GN_SILU_MAX_SLAB_BYTES:
        return _gn_silu_pallas(x, p["scale"], p["bias"], num_groups)
    return _gn_silu_xla(x, p["scale"], p["bias"], num_groups)


# ---------------------------------------------------------------------------
# Direct 3x3 convolution (Pallas) — the sampler's MXU-occupancy fix
# ---------------------------------------------------------------------------
#
# XLA's conv lowering measures ~21 TFLOP/s on the UNet's 64-channel 3x3
# convs (docs/DESIGN.md): 64-wide channels leave the 128-wide MXU
# half-empty. ops/conv_pallas.py keeps the im2col repack in VMEM so the
# MXU sees a K=9*Cin contraction. Forward kernel + XLA VJP, same pattern
# as gn_silu above.


@jax.custom_vjp
def _conv3x3_pallas(x: Array, w: Array, b: Array) -> Array:
    from rectified_flow_vision_tpu.ops import conv_pallas as C

    return C.conv3x3(x, w, b)


def _conv3x3_fwd(x, w, b):
    return _conv3x3_pallas(x, w, b), (x, w)


def _conv3x3_bwd(res, g):
    x, w = res
    b0 = jax.numpy.zeros((w.shape[-1],), jax.numpy.float32)
    _, vjp = jax.vjp(
        lambda x_, w_, b_: P.conv2d(x_, {"w": w_, "b": b_}), x, w, b0
    )
    return vjp(g)


_conv3x3_pallas.defvjp(_conv3x3_fwd, _conv3x3_bwd)


def conv2d_fused(
    x: Array, p: dict, *, stride: int = 1, use_pallas: bool = False
) -> Array:
    """NHWC conv: Pallas direct kernel on supported hot shapes, XLA else.

    Numerically equivalent to ``P.conv2d`` (tests/test_conv_pallas.py).
    Not mesh-aware: GSPMD has no partitioning rule for pallas_call, so
    mesh training/sampling passes ``use_pallas=False`` (as with the other
    forward kernels).

    RFV_CONV_PALLAS=1 force-enables the kernel on supported shapes
    (single-chip A/B experiments only; kernel variant selected by
    RFV_CONV_VARIANT, see ops/conv_pallas.conv3x3).

    RFV_CONV_WINOGRAD=1 routes qualifying 3x3/stride-1 convs through the
    Winograd F(2x2,3x3) path (ops/winograd.py) — pure XLA einsums, so it
    is mesh-safe, but gated for A/B until measured (tools/bench_winograd).
    """
    import os

    if (
        os.environ.get("RFV_CONV_WINOGRAD")
        and stride == 1
        and p["w"].shape[:2] == (3, 3)
        and x.shape[1] % 2 == 0
        and x.shape[2] % 2 == 0
    ):
        from rectified_flow_vision_tpu.ops.winograd import conv2d_winograd

        return conv2d_winograd(x, p)
    if os.environ.get("RFV_CONV_PALLAS"):
        use_pallas = True
    if use_pallas:
        from rectified_flow_vision_tpu.ops import conv_pallas as C
        from rectified_flow_vision_tpu.ops import pallas_kernels as K

        if (pallas_available() or K._INTERPRET) and C.supports(
            x.shape, p["w"].shape, stride
        ):
            w = p["w"].astype(x.dtype)
            b = p["b"].astype(jax.numpy.float32)
            return _conv3x3_pallas(x, w, b)
    return P.conv2d(x, p, stride=stride)


# ---------------------------------------------------------------------------
# Spatial self-attention
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _attention_pallas(x: Array, p: dict, num_heads: int, num_groups: int) -> Array:
    from rectified_flow_vision_tpu.ops import pallas_kernels as K

    return K.attention_block(x, p, num_heads=num_heads, num_groups=num_groups)


def _attention_fwd(x, p, num_heads, num_groups):
    return _attention_pallas(x, p, num_heads, num_groups), (x, p)


def _attention_bwd(num_heads, num_groups, res, g):
    x, p = res
    _, vjp = jax.vjp(
        lambda x_, p_: P.spatial_attention(
            x_, p_, num_heads=num_heads, num_groups=num_groups
        ),
        x,
        p,
    )
    return vjp(g)


_attention_pallas.defvjp(_attention_fwd, _attention_bwd)


def attention(
    x: Array,
    p: dict,
    *,
    num_heads: int = 4,
    num_groups: int = 8,
    use_pallas: bool = False,
) -> Array:
    """Spatial self-attention block (norm -> qkv -> attn -> proj -> +x)."""
    if use_pallas and pallas_available():
        return _attention_pallas(x, p, num_heads, num_groups)
    return P.spatial_attention(x, p, num_heads=num_heads, num_groups=num_groups)


# ---------------------------------------------------------------------------
# Hardware-PRNG dropout
# ---------------------------------------------------------------------------
#
# Measured on v5e (64x64 UNet train step, batch 256, bf16): XLA dropout
# costs 38 ms of the 134 ms step (threefry bit generation + the mask select
# breaking gn_silu->conv fusion + mask re-reads in backward). The Pallas
# kernel generates bits with the on-core PRNG and the custom VJP
# REGENERATES the mask from the saved int32 seed, so no mask tensor is ever
# written to or read from HBM. Unlike gn_silu/attention (XLA wins, default
# off), this kernel wins and is on by default whenever shapes allow.


# ---------------------------------------------------------------------------
# Fused GroupNorm + SiLU + dropout (the resblock's second chain)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _gn_silu_dropout_pallas(x, scale, bias, seed, rate: float, num_groups: int):
    from rectified_flow_vision_tpu.ops import pallas_kernels as K

    return K.gn_silu_dropout(
        x, scale, bias, seed, rate, num_groups=num_groups
    )


def _gsd_fwd(x, scale, bias, seed, rate, num_groups):
    out = _gn_silu_dropout_pallas(x, scale, bias, seed, rate, num_groups)
    return out, (x, scale, bias, seed)


def _gsd_bwd(rate, num_groups, res, g):
    from rectified_flow_vision_tpu.ops import pallas_kernels as K

    x, scale, bias, seed = res
    # the mask is regenerated from the seed (never stored), then the
    # masked cotangent flows through the XLA gn_silu VJP
    gm = K.dropout_mask_apply(g, seed, rate)
    _, vjp = jax.vjp(
        lambda x_, s_, b_: _gn_silu_xla(x_, s_, b_, num_groups), x, scale, bias
    )
    dx, ds, db = vjp(gm)
    return dx, ds, db, None


_gn_silu_dropout_pallas.defvjp(_gsd_fwd, _gsd_bwd)


def _gn_silu_dropout_sharded(x, scale, bias, seed, rate, num_groups, mesh, axis):
    """shard_map wrapper: run the Pallas kernel per data shard.

    GSPMD has no partitioning rule for ``pallas_call`` — under a sharded
    jit the kernel would force activation all-gathers. ``shard_map`` over
    the batch axis makes each device run the kernel on its local shard
    (GroupNorm reduces within a sample, so batch sharding is exact), and
    AD through shard_map applies the kernel's custom VJP per shard. The
    seed is folded with the shard index so dropout masks decorrelate
    across devices; the folded seed is the VJP residual, so the backward
    regenerates the exact same per-shard mask.
    """
    import inspect

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as PS

    def local(x_, scale_, bias_, seed_):
        seed_ = seed_ + jax.lax.axis_index(axis)
        return _gn_silu_dropout_pallas(
            x_, scale_, bias_, seed_, rate, num_groups
        )

    spec = PS(axis, None, None, None)
    kwargs = {}
    # jax>=0.8 traces shard_map bodies with varying-manual-axes checking,
    # which pallas_call's ShapeDtypeStruct outputs don't annotate — the
    # output placement is already stated explicitly by out_specs, so the
    # vma inference adds nothing here and must be disabled.
    if "check_vma" in inspect.signature(shard_map).parameters:
        kwargs["check_vma"] = False
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, PS(None), PS(None), PS(None)),
        out_specs=spec,
        **kwargs,
    )(x, scale, bias, seed)


def gn_silu_dropout(
    x: Array,
    p: dict,
    rate: float,
    rng: Optional[Array],
    *,
    train: bool,
    num_groups: int = 8,
    use_pallas: bool = False,
    pallas_dropout: Optional[bool] = None,
    mesh=None,
    data_axis: str = "data",
) -> Array:
    """gn -> silu -> dropout as one fused pass when the kernel applies.

    The fused kernel is gated on its own merits (auto-on on TPU when the
    per-image slab fits VMEM), independent of the forward-only
    gn_silu/attention kernels which lose to XLA and stay opt-in.
    ``pallas_dropout`` overrides the gate: None => auto (process default
    via ``set_pallas_dropout``), False => force the XLA chain (the model
    kill switch for an explicit ``use_pallas=False``), True => force the
    kernel when shapes allow.

    With ``mesh`` (data-parallel/FSDP training) the kernel survives GSPMD
    via a shard_map over ``data_axis`` — see ``_gn_silu_dropout_sharded``.
    The batch must be divisible by the axis size (trainers guarantee it).
    """
    if not train or rate <= 0.0 or rng is None:
        return gn_silu(x, p, num_groups=num_groups, use_pallas=use_pallas)
    slab_bytes = x.shape[1] * x.shape[2] * x.shape[3] * 4
    enabled = _PALLAS_DROPOUT if pallas_dropout is None else bool(pallas_dropout)
    if (
        pallas_available()
        and enabled
        and slab_bytes <= _GN_SILU_MAX_SLAB_BYTES
        and (mesh is None or x.shape[0] % mesh.shape[data_axis] == 0)
    ):
        import jax.numpy as jnp

        seed = jax.lax.bitcast_convert_type(
            jax.random.bits(rng, (1,), jnp.uint32), jnp.int32
        )
        if mesh is not None:
            return _gn_silu_dropout_sharded(
                x, p["scale"], p["bias"], seed, float(rate), num_groups,
                mesh, data_axis,
            )
        return _gn_silu_dropout_pallas(
            x, p["scale"], p["bias"], seed, float(rate), num_groups
        )
    h = gn_silu(x, p, num_groups=num_groups, use_pallas=use_pallas)
    return P.dropout(h, rate, rng, train=train)
