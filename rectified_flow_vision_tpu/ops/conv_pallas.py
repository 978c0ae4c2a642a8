"""Pallas TPU direct 3x3 convolution for the sampler's hot shapes.

Why this exists (measured, docs/DESIGN.md): XLA's conv lowering reaches
only ~21 TFLOP/s on the UNet's dominant 64-channel 3x3 convs (reference
conv sites: models/unet.py res-blocks) — the 128-wide MXU runs half-empty
on 64-wide channels, and neither an im2col re-expression nor a
space-to-depth packing at the JAX level recovers the loss (the repack
costs full HBM round trips). This kernel keeps the repack in VMEM: each
grid step DMAs one padded row-strip HBM->VMEM (double-buffered across the
sequential TPU grid), builds the (TILE_H*W, 9*Cin) patch matrix in
registers, and runs a single MXU matmul against the (9*Cin, Cout) packed
weights — one HBM read of x and one write of y total, with a K=9*Cin
contraction that fills the MXU's K dimension even when Cin is 64.

Forward-only kernel; ops/fused.py wraps it in ``jax.custom_vjp`` with the
XLA conv VJP so it drops into training too (same pattern as gn_silu).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rectified_flow_vision_tpu.ops import pallas_kernels as K

Array = jax.Array


def supports(x_shape, w_shape, stride: int) -> bool:
    """Shapes this kernel handles profitably: 3x3/stride-1, lane-aligned
    channels, height divisible by a usable strip tile."""
    if stride != 1 or len(w_shape) != 4 or w_shape[:2] != (3, 3):
        return False
    n, h, wdt, cin = x_shape
    cout = w_shape[3]
    if w_shape[2] != cin:
        return False
    if cin % 64 != 0 or cout % 64 != 0:
        return False
    if h < 8 or wdt < 8 or wdt > 256:
        return False
    return _tile_h(h, wdt) is not None


def _tile_h(h: int, w: int):
    """Largest strip height dividing h with TILE_H*W in [256, 4096]."""
    best = None
    for t in range(h, 0, -1):
        if h % t:
            continue
        m = t * w
        if m > 4096:
            continue
        if m < 256 and best is not None:
            break
        best = t
        if m <= 2048:
            break
    return best


def _round8(v: int) -> int:
    return (v + 7) // 8 * 8


def _conv_kernel(prev_ref, cur_ref, next_ref, wp_ref, b_ref, o_ref, patch, *,
                 tile_h: int, wdt: int, cin: int):
    """One grid step: row-strip with halo -> out (tile_h, wdt, cout).

    The halo rows come from the neighbouring row-blocks (three views of
    the same input, clamped index maps — Pallas double-buffers all three),
    masked to zero at the image's top/bottom edge.
    """
    i = pl.program_id(1)
    ni = pl.num_programs(1)

    top = jnp.where(i > 0, prev_ref[0, tile_h - 1:tile_h], 0.0)
    bot = jnp.where(i < ni - 1, next_ref[0, 0:1], 0.0)
    strip = jnp.concatenate([top, cur_ref[0], bot], axis=0)

    # Build the (tile_h*wdt, 9*cin) patch matrix in VMEM scratch, then ONE
    # large 2D MXU matmul. The per-piece reshape collapses the untiled row
    # dim into sublanes (free); the scratch stores absorb the shifted
    # views' sublane/lane offsets. A 3D dot would decompose into tile_h
    # separate M=wdt matmuls that starve the MXU — M must be the full
    # tile_h*wdt.
    for k, (dy, dx) in enumerate(
        (dy, dx) for dy in range(3) for dx in range(3)
    ):
        patch[:, k * cin:(k + 1) * cin] = strip[
            dy:dy + tile_h, dx:dx + wdt, :
        ].reshape(tile_h * wdt, cin)
    y = jnp.dot(patch[:], wp_ref[:], preferred_element_type=jnp.float32)
    y = (y + b_ref[:].astype(jnp.float32)).astype(o_ref.dtype)
    o_ref[0] = y.reshape(tile_h, wdt, y.shape[-1])


@functools.partial(jax.jit, static_argnames=("tile_h", "wdt"))
def _conv3x3_padded(
    xw: Array, wp: Array, b: Array, *, tile_h: int, wdt: int
) -> Array:
    n, h, wpad, cin = xw.shape
    cout = wp.shape[1]
    grid = (n, h // tile_h)
    nblk = h // tile_h
    xspec = lambda fi: pl.BlockSpec(  # noqa: E731
        (1, tile_h, wpad, cin),
        lambda nn, ii: (nn, jnp.clip(ii + fi, 0, nblk - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(
            _conv_kernel, tile_h=tile_h, wdt=wdt, cin=cin,
        ),
        grid=grid,
        in_specs=[
            xspec(-1),
            xspec(0),
            xspec(1),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, wdt, cout), lambda nn, ii: (nn, ii, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, wdt, cout), xw.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h * wdt, 9 * cin), xw.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * wdt * 9 * cin * cout,
            bytes_accessed=(
                3 * xw.size * xw.dtype.itemsize
                + n * h * wdt * cout * xw.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=K._INTERPRET,
    )(xw, xw, xw, wp, b)


def conv3x3(x: Array, w: Array, b: Array | None = None) -> Array:
    """3x3/stride-1/pad-1 NHWC conv, Pallas direct kernel.

    x: (N, H, W, Cin); w: HWIO (3, 3, Cin, Cout); b: (Cout,) or None.
    Equivalent to ``lax.conv_general_dilated`` with symmetric pad 1
    (equivalence-tested in tests/test_conv_pallas.py).
    """
    n, h, wdt, cin = x.shape
    cout = w.shape[3]
    tile_h = _tile_h(h, wdt)
    assert tile_h is not None, (x.shape, w.shape)
    # Width zero-padded (conv pad 1, rounded to the sublane tiling of 8);
    # height halos come from the neighbouring row-blocks inside the kernel.
    wpad = _round8(wdt + 2)
    xw = jnp.pad(x, ((0, 0), (0, 0), (1, 1 + wpad - (wdt + 2)), (0, 0)))
    wp = w.astype(x.dtype).reshape(9 * cin, cout)
    bb = jnp.zeros((1, cout), jnp.float32) if b is None else (
        b.astype(jnp.float32).reshape(1, cout)
    )
    return _conv3x3_padded(xw, wp, bb, tile_h=tile_h, wdt=wdt)


if __name__ == "__main__":
    import time

    import numpy as np

    for (n, h, wdt, c, f) in [
        (256, 64, 64, 64, 64),
        (256, 32, 32, 128, 128),
        (256, 16, 16, 256, 256),
        (256, 64, 64, 64, 128),
    ]:
        key = jax.random.key(0)
        x = jax.random.normal(key, (n, h, wdt, c), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, c, f), jnp.bfloat16) * 0.05
        b = jax.random.normal(key, (f,), jnp.float32)

        ref = jax.jit(
            lambda x, w: jax.lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16,
            )
        )

        y1 = conv3x3(x, w, b)
        y0 = ref(x, w) + b.astype(jnp.bfloat16)
        err = float(
            jnp.max(jnp.abs(y1.astype(jnp.float32) - y0.astype(jnp.float32)))
            / jnp.max(jnp.abs(y0.astype(jnp.float32)))
        )

        def bench(fn, *args):
            out = fn(*args)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(20):
                out = fn(*args)
            jax.block_until_ready(out)
            float(jnp.sum(out.astype(jnp.float32)))  # sync through tunnel
            return (time.perf_counter() - t0) / 20

        fl = 2 * n * h * wdt * 9 * c * f
        tp = bench(jax.jit(conv3x3), x, w, b)
        tx = bench(lambda x, w: ref(x, w) + b.astype(jnp.bfloat16), x, w)
        print(
            f"({n},{h},{wdt},{c})->{f}: rel_err={err:.2e} "
            f"pallas {tp*1e3:.3f} ms {fl/tp/1e12:.1f} TF/s | "
            f"xla {tx*1e3:.3f} ms {fl/tx/1e12:.1f} TF/s | "
            f"speedup {tx/tp:.2f}x",
            flush=True,
        )
