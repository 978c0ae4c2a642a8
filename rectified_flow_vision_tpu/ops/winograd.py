"""Winograd F(2x2, 3x3) convolution in pure JAX (NHWC / HWIO).

Motivation: the sampler's measured ceiling is XLA's direct-conv lowering
for small channel counts (docs/DESIGN.md "Negative result": the dominant
64-channel 3x3 stride-1 conv at 64x64 reaches ~21 TFLOP/s of 197 peak, and
five Pallas direct/im2col strategies all lost to XLA's fused emitter).
Winograd attacks the ceiling differently: it *reduces* the multiply count
2.25x and recasts the conv as 16 large batched matmuls — the shape the MXU
is built for — instead of trying to lower the same 9-tap stencil better.

Algorithm (Lavin & Gray, "Fast Algorithms for Convolutional Neural
Networks", arXiv:1509.09308): for each output 2x2 tile,
    Y = A^T [ (G g G^T) . (B^T d B) ] A
with 4x4 input tiles d overlapping by 2, 3x3 filters g, and the constant
transforms below. All transform arithmetic is cheap elementwise add/sub
(coefficients in {0, +-1, +-1/2}); the only multiplies are the per-tap
[B*nH*nW, C] @ [C, K] contractions.

Implementation notes (TPU-first):
- The 16 overlapping-tile elements are materialised as 16 *strided slices*
  of the padded input (no gather): tile element (i, j) over all tiles is
  x_pad[:, i::2, j::2, :]. XLA fuses the +-1/2 combinations that follow.
- The tap contraction is one einsum over a leading [4, 4] tap batch —
  a single batched matmul with M = B*(H/2)*(W/2) rows, which for the
  UNet's 64x64/64ch regime is ~260k rows: deep enough to keep the MXU
  streaming despite the 64-wide contraction.
- Transforms run in the compute dtype; the tap matmul accumulates fp32
  via preferred_element_type (same discipline as ops.primitives.conv2d).

Scope: kernel 3x3, stride 1, symmetric pad 1 (the reference UNet's
res-block convs, models/unet.py:30-64). Even spatial dims are required
(all UNet resolutions are powers of two). Everything else falls back to
``ops.primitives.conv2d`` at the call site.

Measured outcome (v5e bf16 batch 256, tools/bench_winograd.py): 6-11x
SLOWER than XLA's direct conv at every UNet shape — the conv is
bandwidth-bound at these channel widths and the 16-tap input-transform
tensor costs ~16x the input's HBM bytes, which swamps the 2.25x multiply
saving. Kept as a gated (RFV_CONV_WINOGRAD=1), correctness-tested
negative result; see docs/DESIGN.md "Negative result" for the analysis.

Reference parity note: this computes the same conv as
``lax.conv_general_dilated`` (equivalence-tested in
tests/test_winograd.py); it is a performance strategy, not new semantics.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array

# F(2x2, 3x3) transform constants (Lavin & Gray section 4.1).
_BT = np.array(
    [
        [1.0, 0.0, -1.0, 0.0],
        [0.0, 1.0, 1.0, 0.0],
        [0.0, -1.0, 1.0, 0.0],
        [0.0, 1.0, 0.0, -1.0],
    ],
    dtype=np.float32,
)
_G = np.array(
    [
        [1.0, 0.0, 0.0],
        [0.5, 0.5, 0.5],
        [0.5, -0.5, 0.5],
        [0.0, 0.0, 1.0],
    ],
    dtype=np.float32,
)
_AT = np.array(
    [
        [1.0, 1.0, 1.0, 0.0],
        [0.0, 1.0, -1.0, -1.0],
    ],
    dtype=np.float32,
)


def transform_filter(w: Array) -> Array:
    """HWIO [3,3,C,K] -> tap-domain [4,4,C,K]: U = G g G^T per (C,K).

    Cheap (CK * 4x3x3 mults); recomputed per call so the public param
    pytree stays HWIO and .pt import/export is untouched.
    """
    g = w.astype(jnp.float32)
    u = jnp.einsum("ui,ijck->ujck", _G, g)
    return jnp.einsum("ujck,vj->uvck", u, _G)


def winograd_conv3x3(x: Array, w: Array, b: Array | None = None) -> Array:
    """3x3/stride-1/pad-1 NHWC conv via Winograd F(2x2, 3x3).

    Equivalent to ``conv2d`` on the same operands (HWIO weights), for even
    H and W. Output dtype follows the input; bias is added in fp32.
    """
    bsz, h, wid, c = x.shape
    assert w.shape[:2] == (3, 3), f"3x3 only, got {w.shape}"
    assert h % 2 == 0 and wid % 2 == 0, f"even spatial dims only, got {h}x{wid}"
    k = w.shape[-1]
    nh, nw = h // 2, wid // 2
    dtype = x.dtype

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # 16 strided views: element (i, j) of every 4x4 tile. Shapes [B,nh,nw,C].
    rows = []
    for i in range(4):
        cols = []
        for j in range(4):
            cols.append(
                jax.lax.slice(
                    xp,
                    (0, i, j, 0),
                    (bsz, i + 2 * nh - 1, j + 2 * nw - 1, c),
                    (1, 2, 2, 1),
                )
            )
        rows.append(jnp.stack(cols))
    d = jnp.stack(rows)  # [4, 4, B, nh, nw, C]

    bt = jnp.asarray(_BT, dtype)
    at = jnp.asarray(_AT, dtype)
    # V = B^T d B over the leading tap axes (elementwise adds after fusion).
    v = jnp.einsum("ui,ij...->uj...", bt, d)
    v = jnp.einsum("uj...,vj->uv...", v, bt)

    u = transform_filter(w).astype(dtype)  # [4, 4, C, K]

    # The only multiplies: per-tap [B*nh*nw, C] @ [C, K], fp32 accumulate.
    m = jnp.einsum(
        "uvbhwc,uvck->uvbhwk", v, u, preferred_element_type=jnp.float32
    )

    # Y = A^T m A -> [2, 2, B, nh, nw, K], interleave into [B, H, W, K].
    y = jnp.einsum("pu,uvbhwk->pvbhwk", at.astype(jnp.float32), m)
    y = jnp.einsum("pvbhwk,qv->pqbhwk", y, at.astype(jnp.float32))
    y = y.transpose(2, 3, 0, 4, 1, 5).reshape(bsz, h, wid, k)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(dtype)


def conv2d_winograd(x: Array, p: dict) -> Array:
    """Drop-in for ``ops.primitives.conv2d`` on 3x3/stride-1 params."""
    return winograd_conv3x3(x, p["w"].astype(x.dtype), p["b"])
