"""UNet velocity-field backbone, TPU-native (NHWC, pytree params).

Capability parity with the reference UNet (reference: models/unet.py:126-275):

* sinusoidal time embedding -> MLP(C -> 4C -> 4C, SiLU between),
* 3x3 input conv,
* encoder: ``len(channel_mult)`` levels x ``num_res_blocks`` residual blocks
  (pre-activation GroupNorm(8)+SiLU, additive per-channel time bias), one
  skip saved per level *before* a strided-conv 3x3/s2 downsample,
* middle: res-block, 4-head spatial self-attention, res-block,
* decoder: per level one skip concat + res-blocks, then nearest-2x-upsample
  + 3x3 conv,
* head: GroupNorm + SiLU + 3x3 conv.

Default config has exactly 11,255,363 parameters (golden-tested), matching
the reference. ``attention_resolutions`` is accepted for config parity but —
as in the reference (models/unet.py:143, never used) — attention runs only
at the middle block.

Design differences from the reference (deliberate, TPU-first):
NHWC/HWIO layouts, params as a pure pytree (functional ``init``/``apply``),
explicit dropout PRNG, fused Pallas GroupNorm+SiLU / attention kernels behind
a flag, and a compute-dtype knob for bf16 inference.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from rectified_flow_vision_tpu.ops import primitives as P
from rectified_flow_vision_tpu.ops import fused as F

Array = jax.Array
Params = Dict[str, Any]


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 3
    model_channels: int = 64
    out_channels: int = 3
    channel_mult: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (16, 8)
    dropout: float = 0.1
    num_heads: int = 4
    num_groups: int = 8

    @property
    def num_levels(self) -> int:
        return len(self.channel_mult)

    @property
    def channels(self) -> List[int]:
        return [self.model_channels * m for m in self.channel_mult]

    @property
    def time_emb_dim(self) -> int:
        return self.model_channels * 4


# ---------------------------------------------------------------------------
# Residual block
# ---------------------------------------------------------------------------


def _resblock_init(
    key: Array, in_ch: int, out_ch: int, time_dim: int
) -> Params:
    keys = jax.random.split(key, 4)
    p: Params = {
        "norm1": P.groupnorm_init(in_ch),
        "conv1": P.conv_init(keys[0], 3, 3, in_ch, out_ch),
        "norm2": P.groupnorm_init(out_ch),
        "conv2": P.conv_init(keys[1], 3, 3, out_ch, out_ch),
        "time": P.dense_init(keys[2], time_dim, out_ch),
    }
    if in_ch != out_ch:
        p["shortcut"] = P.conv_init(keys[3], 1, 1, in_ch, out_ch)
    return p


def _resblock_apply(
    p: Params,
    x: Array,
    t_emb: Array,
    *,
    cfg: UNetConfig,
    train: bool,
    rng: Optional[Array],
    use_pallas: bool,
    pallas_dropout: Optional[bool] = None,
    pallas_mesh=None,
) -> Array:
    """Pre-activation residual block with additive time conditioning.

    h = conv1(silu(gn(x))); h += Linear(silu(t_emb)); h = conv2(dropout(
    silu(gn(h)))); return h + shortcut(x). (reference: models/unet.py:55-64)
    """
    h = F.gn_silu(x, p["norm1"], num_groups=cfg.num_groups, use_pallas=use_pallas)
    h = F.conv2d_fused(h, p["conv1"])

    t_bias = P.dense(P.silu(t_emb), p["time"])
    h = h + t_bias[:, None, None, :].astype(h.dtype)

    # gn -> silu -> dropout fused into one Pallas pass on TPU (hardware
    # PRNG, mask regenerated in backward — see ops/fused.py); falls back
    # to the XLA chain off-TPU or in eval mode. ``pallas_mesh`` keeps the
    # kernel alive under data-parallel meshes via shard_map.
    h = F.gn_silu_dropout(
        h, p["norm2"], cfg.dropout, rng, train=train,
        num_groups=cfg.num_groups, use_pallas=use_pallas,
        pallas_dropout=pallas_dropout, mesh=pallas_mesh,
    )
    h = F.conv2d_fused(h, p["conv2"])

    shortcut = P.conv2d(x, p["shortcut"]) if "shortcut" in p else x
    return h + shortcut


def _attn_init(key: Array, ch: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "norm": P.groupnorm_init(ch),
        "qkv": P.dense_init(k1, ch, ch * 3),
        "proj": P.dense_init(k2, ch, ch),
    }


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------


class UNet:
    """Functional UNet: ``params = unet.init(key)``, ``y = unet.apply(params, x, t)``."""

    def __init__(
        self,
        in_channels: int = 3,
        model_channels: int = 64,
        out_channels: int = 3,
        channel_mult: Sequence[int] = (1, 2, 4),
        num_res_blocks: int = 2,
        attention_resolutions: Sequence[int] = (16, 8),
        dropout: float = 0.1,
    ):
        self.cfg = UNetConfig(
            in_channels=in_channels,
            model_channels=model_channels,
            out_channels=out_channels,
            channel_mult=tuple(channel_mult),
            num_res_blocks=num_res_blocks,
            attention_resolutions=tuple(attention_resolutions),
            dropout=dropout,
        )

    # ---- init ------------------------------------------------------------

    def init(self, key: Array) -> Params:
        cfg = self.cfg
        chans = cfg.channels
        tdim = cfg.time_emb_dim
        keys = iter(jax.random.split(key, 64))

        params: Params = {
            "time_mlp": {
                "lin1": P.dense_init(next(keys), cfg.model_channels, tdim),
                "lin2": P.dense_init(next(keys), tdim, tdim),
            },
            "input_conv": P.conv_init(next(keys), 3, 3, cfg.in_channels, cfg.model_channels),
        }

        # Encoder
        enc: Params = {}
        downs: Params = {}
        in_ch = cfg.model_channels
        for level in range(cfg.num_levels):
            out_ch = chans[level]
            for i in range(cfg.num_res_blocks):
                enc[f"{level}_{i}"] = _resblock_init(next(keys), in_ch, out_ch, tdim)
                in_ch = out_ch
            if level < cfg.num_levels - 1:
                downs[str(level)] = P.conv_init(next(keys), 3, 3, out_ch, out_ch)
        params["enc_blocks"] = enc
        params["downsamples"] = downs

        # Middle
        mid_ch = chans[-1]
        params["mid_block1"] = _resblock_init(next(keys), mid_ch, mid_ch, tdim)
        params["mid_attn"] = _attn_init(next(keys), mid_ch)
        params["mid_block2"] = _resblock_init(next(keys), mid_ch, mid_ch, tdim)

        # Decoder
        dec: Params = {}
        ups: Params = {}
        in_ch = mid_ch
        for level in range(cfg.num_levels - 1, -1, -1):
            out_ch = chans[level]
            skip_ch = chans[level]
            dec[f"{level}_0"] = _resblock_init(next(keys), in_ch + skip_ch, out_ch, tdim)
            for i in range(1, cfg.num_res_blocks):
                dec[f"{level}_{i}"] = _resblock_init(next(keys), out_ch, out_ch, tdim)
            in_ch = out_ch
            if level > 0:
                ups[str(level)] = P.conv_init(next(keys), 3, 3, out_ch, out_ch)
        params["dec_blocks"] = dec
        params["upsamples"] = ups

        # Output head
        params["output_conv"] = {
            "norm": P.groupnorm_init(chans[0]),
            "conv": P.conv_init(next(keys), 3, 3, chans[0], cfg.out_channels),
        }
        return params

    # ---- apply -------------------------------------------------------------

    def apply(
        self,
        params: Params,
        x: Array,
        t: Array,
        *,
        train: bool = False,
        rng: Optional[Array] = None,
        compute_dtype: jnp.dtype = jnp.float32,
        use_pallas: bool = False,
        remat: bool = False,
        pallas_dropout: Optional[bool] = None,
        pallas_mesh=None,
    ) -> Array:
        """Velocity prediction v(x, t). x: [B, H, W, C] NHWC; t: [B] in [0,1].

        ``remat`` recomputes each residual block in the backward pass
        (jax.checkpoint) — a MEMORY lever for models that don't fit HBM,
        not a speed one here: measured at the flagship shape (64x64, batch
        256, bf16, v5e) remat=True drops the train step from ~2034 to
        ~302 img/s (the conv recompute is far more expensive than the
        activation re-reads it saves). Default off; the DiT path enables
        it per-config for long token sequences.
        """
        cfg = self.cfg
        x = x.astype(compute_dtype)

        # Time embedding MLP
        t_emb = P.sinusoidal_time_embedding(t, cfg.model_channels).astype(compute_dtype)
        t_emb = P.dense(t_emb, params["time_mlp"]["lin1"])
        t_emb = P.silu(t_emb)
        t_emb = P.dense(t_emb, params["time_mlp"]["lin2"])

        # Per-block dropout keys (stable split order: encoder, middle, decoder)
        n_enc = cfg.num_levels * cfg.num_res_blocks
        n_dec = cfg.num_levels * cfg.num_res_blocks
        n_rngs = n_enc + 2 + n_dec
        if train and rng is not None and cfg.dropout > 0:
            rngs = list(jax.random.split(rng, n_rngs))
        else:
            rngs = [None] * n_rngs
        rng_it = iter(rngs)

        def _res_fn(p, h, temb, block_rng):
            return _resblock_apply(
                p, h, temb, cfg=cfg, train=train, rng=block_rng,
                use_pallas=use_pallas, pallas_dropout=pallas_dropout,
                pallas_mesh=pallas_mesh,
            )

        if remat:
            _res_fn = jax.checkpoint(_res_fn)

        def res(p, h):
            return _res_fn(p, h, t_emb, next(rng_it))

        h = P.conv2d(x, params["input_conv"])

        # Encoder
        skips: List[Array] = []
        for level in range(cfg.num_levels):
            for i in range(cfg.num_res_blocks):
                h = res(params["enc_blocks"][f"{level}_{i}"], h)
            skips.append(h)  # saved before downsample (reference: unet.py:245)
            if level < cfg.num_levels - 1:
                h = P.conv2d(h, params["downsamples"][str(level)], stride=2)

        # Middle
        h = res(params["mid_block1"], h)
        h = F.attention(
            h,
            params["mid_attn"],
            num_heads=cfg.num_heads,
            num_groups=cfg.num_groups,
            use_pallas=use_pallas,
        )
        h = res(params["mid_block2"], h)

        # Decoder
        for level in range(cfg.num_levels - 1, -1, -1):
            skip = skips.pop()
            h = jnp.concatenate([h, skip.astype(h.dtype)], axis=-1)
            for i in range(cfg.num_res_blocks):
                h = res(params["dec_blocks"][f"{level}_{i}"], h)
            if level > 0:
                h = P.upsample_nearest_2x(h)
                h = F.conv2d_fused(h, params["upsamples"][str(level)])

        # Output head
        h = F.gn_silu(
            h, params["output_conv"]["norm"], num_groups=cfg.num_groups, use_pallas=use_pallas
        )
        h = P.conv2d(h, params["output_conv"]["conv"])
        return h

    __call__ = apply


def count_parameters(params_or_model) -> int:
    """Total trainable parameter count (reference: models/unet.py:278-280)."""
    if isinstance(params_or_model, UNet):
        raise ValueError("pass a params pytree, e.g. count_parameters(unet.init(key))")
    leaves = jax.tree_util.tree_leaves(params_or_model)
    return int(sum(leaf.size for leaf in leaves))


if __name__ == "__main__":
    # Smoke test (parity with reference models/unet.py:283-306)
    import jax as _jax

    _unet = UNet()
    _params = _unet.init(_jax.random.key(0))
    print(f"Number of parameters: {count_parameters(_params):,}")
    _x = _jax.random.normal(_jax.random.key(1), (2, 64, 64, 3))
    _t = _jax.random.uniform(_jax.random.key(2), (2,))
    _out = _unet.apply(_params, _x, _t)
    print(f"Input shape: {_x.shape}")
    print(f"Output shape: {_out.shape}")
