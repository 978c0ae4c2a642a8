"""Core NHWC compute primitives (pure-XLA reference implementations).

These are the building blocks of the velocity-field networks. Everything is
NHWC / HWIO — the TPU-native layout (the reference is NCHW torch eager,
reference: models/unet.py). Pallas-fused variants of the hot elementwise
chains live in ``ops.fused``; these XLA versions are both the fallback path
and the ground truth for kernel equivalence tests.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# Parameter initialisation (matches torch defaults so that small-data training
# dynamics are comparable; torch Conv2d/Linear use kaiming_uniform(a=sqrt(5))
# for weights == U(-1/sqrt(fan_in), 1/sqrt(fan_in)), and the same bound for
# biases).
# ---------------------------------------------------------------------------


def conv_init(
    key: Array, kh: int, kw: int, in_ch: int, out_ch: int, dtype=jnp.float32
) -> dict:
    """HWIO conv kernel + bias with torch-default uniform init."""
    wkey, bkey = jax.random.split(key)
    fan_in = in_ch * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": jax.random.uniform(
            wkey, (kh, kw, in_ch, out_ch), dtype, minval=-bound, maxval=bound
        ),
        "b": jax.random.uniform(bkey, (out_ch,), dtype, minval=-bound, maxval=bound),
    }


def dense_init(key: Array, in_dim: int, out_dim: int, dtype=jnp.float32) -> dict:
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    return {
        "w": jax.random.uniform(
            wkey, (in_dim, out_dim), dtype, minval=-bound, maxval=bound
        ),
        "b": jax.random.uniform(bkey, (out_dim,), dtype, minval=-bound, maxval=bound),
    }


def groupnorm_init(ch: int, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((ch,), dtype), "bias": jnp.zeros((ch,), dtype)}


# ---------------------------------------------------------------------------
# Forward primitives
# ---------------------------------------------------------------------------


def conv2d(x: Array, p: dict, *, stride: int = 1) -> Array:
    """NHWC conv with torch-style symmetric padding k//2.

    All reference convs are 3x3/pad1 or 1x1/pad0 (reference: models/unet.py).
    Explicit symmetric padding, NOT XLA "SAME": for stride-2 "SAME" pads
    asymmetrically (0 low / 1 high on even sizes) while torch pads (1, 1),
    which would misalign imported .pt checkpoints.
    """
    w = p["w"].astype(x.dtype)
    kh, kw = w.shape[0], w.shape[1]
    # odd kernels: torch's pad=k//2; even kernels (patchify convs, any
    # size): no padding — windows must tile the image exactly.
    ph = kh // 2 if kh % 2 else 0
    pw = kw // 2 if kw % 2 else 0
    # Output dtype follows the input: the MXU accumulates fp32 internally
    # for bf16 operands regardless, and preferred_element_type=f32 with
    # bf16 inputs breaks conv's VJP (cotangent/operand dtype mismatch).
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=((ph, ph), (pw, pw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    return (out.astype(jnp.float32) + p["b"].astype(jnp.float32)).astype(x.dtype)


def dense(x: Array, p: dict) -> Array:
    out = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=x.dtype)
    return (out.astype(jnp.float32) + p["b"].astype(jnp.float32)).astype(x.dtype)


def group_norm(x: Array, p: dict, *, num_groups: int = 8, eps: float = 1e-5) -> Array:
    """GroupNorm over an NHWC tensor (stats per (batch, group) in fp32)."""
    b, h, w, c = x.shape
    xg = x.astype(jnp.float32).reshape(b, h * w, num_groups, c // num_groups)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 3), keepdims=True)
    xn = (xg - mean) * jax.lax.rsqrt(var + eps)
    xn = xn.reshape(b, h, w, c)
    out = xn * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def silu(x: Array) -> Array:
    return x * jax.nn.sigmoid(x)


def upsample_nearest_2x(x: Array) -> Array:
    """Nearest-neighbour 2x upsample, NHWC."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def sinusoidal_time_embedding(t: Array, dim: int) -> Array:
    """Sinusoidal position embedding of scalar times t in [0, 1].

    Matches the reference formula (models/unet.py:20-27): frequencies
    exp(-log(10000) * i / (dim/2 - 1)), concat(sin, cos).
    """
    half = dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1))
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def spatial_attention(
    x: Array, p: dict, *, num_heads: int = 4, num_groups: int = 8
) -> Array:
    """Multi-head self-attention over spatial positions (NHWC in/out).

    Equivalent to the reference AttentionBlock (models/unet.py:67-100):
    GroupNorm -> qkv projection -> softmax attention over H*W tokens ->
    output projection -> residual add. The qkv/proj 1x1 convs of the
    reference are expressed as dense layers over the channel axis.
    """
    b, h, w, c = x.shape
    n = h * w
    d = c // num_heads

    xn = group_norm(x, p["norm"], num_groups=num_groups)
    qkv = dense(xn.reshape(b, n, c), p["qkv"])  # [B, N, 3C]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, n, num_heads, d).transpose(0, 2, 1, 3)  # [B, H, N, D]
    k = k.reshape(b, n, num_heads, d).transpose(0, 2, 1, 3)
    v = v.reshape(b, n, num_heads, d).transpose(0, 2, 1, 3)

    scale = 1.0 / math.sqrt(d)
    logits = (
        jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
        * scale
    )
    attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v, preferred_element_type=jnp.float32)
    out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, n, c)
    out = dense(out, p["proj"]).reshape(b, h, w, c)
    return x + out


def dropout(
    x: Array, rate: float, rng: Optional[Array], *, train: bool
) -> Array:
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))
