"""Pallas TPU kernels for the hot elementwise/attention chains.

Reference equivalents are pure torch eager ops (reference: models/unet.py:
GroupNorm+SiLU at :55-62, spatial attention at :79-100); XLA ground-truth
implementations live in ``ops.primitives`` and every kernel here is
equivalence-tested against them (tests/test_pallas.py, interpret mode on
CPU, compiled on TPU).

Kernel design notes (TPU):

* ``gn_silu``: one VMEM pass per image. Group statistics are computed as
  per-channel sums reduced channel-wise per group (avoids reshaping the
  (N, C) slab to a sub-lane-width (N, G, C/G) layout); normalize + affine +
  SiLU happen in-register, so the chain costs one HBM read + one write
  instead of the read/write per op of an unfused pipeline.
* ``attention_block``: the full block (GroupNorm -> qkv matmul -> 4-head
  softmax attention over H*W<=256 tokens -> output proj -> residual) fused
  into a single kernel; all matmuls hit the MXU from VMEM, the softmax
  stays in fp32 registers.

Both are forward kernels; training wraps them in ``jax.custom_vjp`` with the
XLA reference's VJP (ops/fused.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_INTERPRET = False  # set True (tests) to run kernels in interpreter mode


def set_interpret(flag: bool) -> None:
    global _INTERPRET
    _INTERPRET = bool(flag)


# ---------------------------------------------------------------------------
# Fused GroupNorm + SiLU
# ---------------------------------------------------------------------------


def _group_onehot(c: int, num_groups: int) -> jax.Array:
    """(C, G) one-hot group-membership matrix, built with 2D iotas.

    Mosaic cannot shape-cast a (1, C) vector to (G, C/G), so per-group
    reductions are expressed as matmuls against this matrix instead:
    group_sums = channel_sums @ M, channel_broadcast = group_vals @ M.T.
    """
    cg = c // num_groups
    chan = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    return (chan // cg == grp).astype(jnp.float32)


def _group_stats(x: jnp.ndarray, num_groups: int, eps: float):
    """Per-channel (mean, rsqrt(var+eps)) of GroupNorm over a (N, C) slab."""
    n, c = x.shape
    cg = c // num_groups
    m = _group_onehot(c, num_groups)  # (C, G)

    # Stats must be exact fp32: force HIGHEST precision so the MXU does not
    # run these reductions through bf16 passes.
    dot = lambda a, b: jnp.dot(  # noqa: E731
        a, b, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    s1 = jnp.sum(x, axis=0, keepdims=True)  # (1, C)
    s2 = jnp.sum(x * x, axis=0, keepdims=True)
    s1g = dot(s1, m)  # (1, G)
    s2g = dot(s2, m)

    cnt = float(n * cg)
    mean_g = s1g / cnt
    var_g = s2g / cnt - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)

    mean_c = dot(mean_g, m.T)  # (1, C)
    inv_c = dot(inv_g, m.T)
    return mean_c, inv_c


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups: int, eps: float):
    x = x_ref[0].astype(jnp.float32)  # (N, C) one image's tokens
    n, c = x.shape
    mean_c, inv_c = _group_stats(x, num_groups, eps)
    scale = scale_ref[:].astype(jnp.float32).reshape(1, c)
    bias = bias_ref[:].astype(jnp.float32).reshape(1, c)
    y = (x - mean_c) * inv_c * scale + bias
    o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


def gn_silu(
    x: Array, scale: Array, bias: Array, *, num_groups: int = 8, eps: float = 1e-5
) -> Array:
    """Fused GroupNorm + SiLU on an NHWC tensor, one grid step per image."""
    b, h, w, c = x.shape
    n = h * w
    xf = x.reshape(b, n, c)

    out = pl.pallas_call(
        functools.partial(_gn_silu_kernel, num_groups=num_groups, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=_INTERPRET,
    )(xf, scale, bias)
    return out.reshape(b, h, w, c)


# ---------------------------------------------------------------------------
# Fused spatial self-attention block
# ---------------------------------------------------------------------------


def _attention_kernel(
    x_ref,
    nscale_ref,
    nbias_ref,
    wqkv_ref,
    bqkv_ref,
    wproj_ref,
    bproj_ref,
    o_ref,
    *,
    num_heads: int,
    num_groups: int,
    eps: float,
):
    in_dtype = x_ref.dtype
    x = x_ref[0].astype(jnp.float32)  # (N, C)
    n, c = x.shape
    d = c // num_heads

    # fp32 inputs get exact matmuls; bf16 inputs keep fast MXU passes.
    prec = (
        jax.lax.Precision.HIGHEST
        if in_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    dot = lambda a, b, dn=None: jax.lax.dot_general(  # noqa: E731
        a,
        b,
        dimension_numbers=dn or (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )

    mean_c, inv_c = _group_stats(x, num_groups, eps)
    xn = (x - mean_c) * inv_c * nscale_ref[:].astype(jnp.float32).reshape(1, c)
    xn = xn + nbias_ref[:].astype(jnp.float32).reshape(1, c)

    # qkv projection (MXU)
    qkv = dot(xn, wqkv_ref[:].astype(jnp.float32)) + bqkv_ref[:].astype(
        jnp.float32
    ).reshape(1, 3 * c)  # (N, 3C)

    scale = 1.0 / math.sqrt(d)
    outs = []
    for h_idx in range(num_heads):  # static unroll over 4 heads
        q = qkv[:, h_idx * d : (h_idx + 1) * d]
        k = qkv[:, c + h_idx * d : c + (h_idx + 1) * d]
        v = qkv[:, 2 * c + h_idx * d : 2 * c + (h_idx + 1) * d]
        logits = dot(q, k, (((1,), (1,)), ((), ()))) * scale  # (N, N)
        logits = logits - jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits)
        attn = e / jnp.sum(e, axis=-1, keepdims=True)
        outs.append(dot(attn, v))  # (N, d)
    att = jnp.concatenate(outs, axis=-1)  # (N, C)

    proj = dot(att, wproj_ref[:].astype(jnp.float32)) + bproj_ref[:].astype(
        jnp.float32
    ).reshape(1, c)
    o_ref[0] = (x + proj).astype(o_ref.dtype)


def attention_block(
    x: Array,
    p: dict,
    *,
    num_heads: int = 4,
    num_groups: int = 8,
    eps: float = 1e-5,
) -> Array:
    """Fused norm->qkv->attention->proj->residual over NHWC (one image/step)."""
    b, h, w, c = x.shape
    n = h * w
    xf = x.reshape(b, n, c)

    kernel = functools.partial(
        _attention_kernel, num_heads=num_heads, num_groups=num_groups, eps=eps
    )
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            full(),
            full(),
            full(),
            full(),
            full(),
            full(),
        ],
        out_specs=pl.BlockSpec(
            (1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=_INTERPRET,
    )(
        xf,
        p["norm"]["scale"],
        p["norm"]["bias"],
        p["qkv"]["w"],
        p["qkv"]["b"],
        p["proj"]["w"],
        p["proj"]["b"],
    )
    return out.reshape(b, h, w, c)


# ---------------------------------------------------------------------------
# Hardware-PRNG dropout
# ---------------------------------------------------------------------------
#
# XLA dropout = threefry bit generation + mask select, and the mask select
# sits between gn_silu and the following conv, breaking their fusion; the
# backward pass additionally re-reads the stored mask. This kernel uses the
# TPU's on-core PRNG (pltpu.prng_random_bits — measured: free next to the
# HBM stream, a copy-only kernel times identically), is seeded per grid
# block, and is DETERMINISTIC in (seed, shape, rate): the backward pass
# regenerates the identical mask from the saved int32 seed instead of
# storing a [B,H,W,C] mask tensor (ops/fused.py wires the custom_vjp).

_DROPOUT_LANES = 1024


def _dropout_block_rows(total: int) -> int:
    """Largest supported block height for a flat [total/1024, 1024] view."""
    if total % _DROPOUT_LANES:
        return 0
    rows = total // _DROPOUT_LANES
    for br in (1024, 512, 256, 128, 64, 32, 16, 8):
        if rows % br == 0:
            return br
    return 0


def dropout(x: Array, seed: Array, rate: float) -> Array:
    """Dropout with hardware PRNG. seed: [1] int32; rate: static in (0,1)."""
    import numpy as _np

    keep = 1.0 - float(rate)
    thresh = _np.uint32(min(int(keep * 2**32), 2**32 - 1))
    inv_keep = _np.float32(1.0 / keep)

    def kernel(seed_ref, x_ref, o_ref):
        i = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + i * 1000003)
        bits = jax.lax.bitcast_convert_type(
            pltpu.prng_random_bits(x_ref.shape), jnp.uint32
        )
        keep_mask = bits < jnp.uint32(thresh)
        o_ref[...] = jnp.where(
            keep_mask, x_ref[...].astype(jnp.float32) * inv_keep, 0.0
        ).astype(o_ref.dtype)

    total = x.size
    block_rows = _dropout_block_rows(total)
    if block_rows == 0:
        raise ValueError(f"dropout kernel unsupported for shape {x.shape}")
    rows = total // _DROPOUT_LANES
    x2 = x.reshape(rows, _DROPOUT_LANES)
    out = pl.pallas_call(
        kernel,
        grid=(rows // block_rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_rows, _DROPOUT_LANES), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, _DROPOUT_LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, _DROPOUT_LANES), x.dtype),
        interpret=_INTERPRET,
    )(seed, x2)
    return out.reshape(x.shape)


# ---------------------------------------------------------------------------
# Fused GroupNorm + SiLU + hardware-PRNG dropout
# ---------------------------------------------------------------------------
#
# The resblock's second chain is gn -> silu -> dropout -> conv
# (reference: models/unet.py:55-64 + nn.Dropout). A standalone dropout
# kernel cannot win: the pallas_call boundary forces the gn_silu output
# through HBM. Fusing the mask INTO the gn_silu kernel makes the whole
# chain one HBM read + one write; bits come from the on-core PRNG.
# Determinism contract: bits depend only on (seed, image index, shape), so
# ``dropout_mask_apply`` regenerates the identical mask for the VJP.


def _gn_silu_dropout_kernel(
    seed_ref, x_ref, scale_ref, bias_ref, o_ref,
    *, num_groups: int, eps: float, thresh: int, inv_keep: float,
):
    x = x_ref[0].astype(jnp.float32)  # (N, C)
    n, c = x.shape
    mean_c, inv_c = _group_stats(x, num_groups, eps)
    scale = scale_ref[:].astype(jnp.float32).reshape(1, c)
    bias = bias_ref[:].astype(jnp.float32).reshape(1, c)
    y = (x - mean_c) * inv_c * scale + bias
    act = y * jax.nn.sigmoid(y)
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * 1000003)
    bits = jax.lax.bitcast_convert_type(
        pltpu.prng_random_bits(act.shape), jnp.uint32
    )
    keep = bits < jnp.uint32(thresh)
    o_ref[0] = jnp.where(keep, act * jnp.float32(inv_keep), 0.0).astype(
        o_ref.dtype
    )


def _dropout_mask_kernel(seed_ref, g_ref, o_ref, *, thresh: int, inv_keep: float):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * 1000003)
    bits = jax.lax.bitcast_convert_type(
        pltpu.prng_random_bits(g_ref[0].shape), jnp.uint32
    )
    keep = bits < jnp.uint32(thresh)
    o_ref[0] = jnp.where(
        keep, g_ref[0].astype(jnp.float32) * jnp.float32(inv_keep), 0.0
    ).astype(o_ref.dtype)


def _rate_consts(rate: float):
    import numpy as _np

    keep = 1.0 - float(rate)
    return (
        int(_np.uint32(min(int(keep * 2**32), 2**32 - 1))),
        float(1.0 / keep),
    )


def gn_silu_dropout(
    x: Array, scale: Array, bias: Array, seed: Array, rate: float,
    *, num_groups: int = 8, eps: float = 1e-5,
) -> Array:
    """GroupNorm + SiLU + dropout in one pass; grid step = one image."""
    b, h, w, c = x.shape
    n = h * w
    thresh, inv_keep = _rate_consts(rate)
    out = pl.pallas_call(
        functools.partial(
            _gn_silu_dropout_kernel,
            num_groups=num_groups, eps=eps, thresh=thresh, inv_keep=inv_keep,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=_INTERPRET,
    )(seed, x.reshape(b, n, c), scale, bias)
    return out.reshape(b, h, w, c)


def dropout_mask_apply(g: Array, seed: Array, rate: float) -> Array:
    """Apply the gn_silu_dropout mask (same seed/shape => same bits) to g."""
    b, h, w, c = g.shape
    n = h * w
    thresh, inv_keep = _rate_consts(rate)
    out = pl.pallas_call(
        functools.partial(
            _dropout_mask_kernel, thresh=thresh, inv_keep=inv_keep
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, c), g.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=_INTERPRET,
    )(seed, g.reshape(b, n, c))
    return out.reshape(b, h, w, c)
