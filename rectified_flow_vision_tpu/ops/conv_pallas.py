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
    """Largest strip height dividing h with TILE_H*W in [256, MAX_M]
    (MAX_M tunable via RFV_CONV_MAX_M for A/B sweeps)."""
    import os

    max_m = int(os.environ.get("RFV_CONV_MAX_M", "4096"))
    brk = min(max_m, max(2048, max_m // 2))
    best = None
    for t in range(h, 0, -1):
        if h % t:
            continue
        m = t * w
        if m > max_m:
            continue
        if m < 256 and best is not None:
            break
        best = t
        if m <= brk:
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


def _conv_kernel_taps(prev_ref, cur_ref, next_ref, w_ref, b_ref, o_ref, *,
                      tile_h: int, wdt: int, cin: int):
    """Variant 'taps': no patch matrix — nine accumulating MXU dots on
    shifted *values* of the strip. Attacks the measured bottleneck of the
    'patch' kernel (the 9 scratch stores building the (M, 9*Cin) matrix
    cost ~9x the strip's bytes in VMEM traffic); here the shifted views
    never round-trip through scratch, at the price of a K=Cin (half-
    filled) contraction per dot."""
    i = pl.program_id(1)
    ni = pl.num_programs(1)

    top = jnp.where(i > 0, prev_ref[0, tile_h - 1:tile_h], 0.0)
    bot = jnp.where(i < ni - 1, next_ref[0, 0:1], 0.0)
    strip = jnp.concatenate([top, cur_ref[0], bot], axis=0)

    acc = None
    for k, (dy, dx) in enumerate(
        (dy, dx) for dy in range(3) for dx in range(3)
    ):
        xm = strip[dy:dy + tile_h, dx:dx + wdt, :].reshape(
            tile_h * wdt, cin
        )
        d = jnp.dot(xm, w_ref[k], preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    y = (acc + b_ref[:].astype(jnp.float32)).astype(o_ref.dtype)
    o_ref[0] = y.reshape(tile_h, wdt, y.shape[-1])


def _conv_kernel_packed(x_ref, top_ref, bot_ref, w_ref, b_ref, o_ref, *,
                        tile_h: int, wdt: int):
    """Variant 'packed': the three width shifts are pre-concatenated along
    the lane dim OUTSIDE the kernel (xcat[..., d*Cin+c] = x_pad[..., w+d, c]),
    so the kernel's only data movement is three free leading-dim slices and
    three K=3*Cin dots — no in-kernel relayout at all. Halo rows arrive as
    separate (1, W, 3Cin) blocks so the main array is read once, not three
    times."""
    strip = jnp.concatenate([top_ref[0], x_ref[0], bot_ref[0]], axis=0)
    kdim = strip.shape[-1]
    acc = None
    for dy in range(3):
        xm = strip[dy:dy + tile_h].reshape(tile_h * wdt, kdim)
        d = jnp.dot(xm, w_ref[dy], preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    y = (acc + b_ref[:].astype(jnp.float32)).astype(o_ref.dtype)
    o_ref[0] = y.reshape(tile_h, wdt, y.shape[-1])


def _conv_kernel_image(x_ref, w_ref, b_ref, o_ref, *, h: int, wdt: int,
                       cin: int, g: int):
    """Variant 'image': whole H-padded image(s) per grid step — one DMA
    view, no halo plumbing, M = H*W per dot. g images per step."""
    for gi in range(g):
        strip = x_ref[gi]  # (h+2, wpad, cin)
        acc = None
        for k, (dy, dx) in enumerate(
            (dy, dx) for dy in range(3) for dx in range(3)
        ):
            xm = strip[dy:dy + h, dx:dx + wdt, :].reshape(h * wdt, cin)
            d = jnp.dot(xm, w_ref[k], preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        y = (acc + b_ref[:].astype(jnp.float32)).astype(o_ref.dtype)
        o_ref[gi] = y.reshape(h, wdt, y.shape[-1])


def _conv_kernel_image_packed(x_ref, w_ref, b_ref, o_ref, *, h: int,
                              wdt: int, g: int):
    """Variant 'imagepacked': H-padded, lane-packed xcat per image — zero
    in-kernel relayouts: three free leading-dim slices, three K=3*Cin
    dots."""
    kdim = x_ref.shape[-1]
    for gi in range(g):
        strip = x_ref[gi]  # (h+2, wdt, 3cin)
        acc = None
        for dy in range(3):
            xm = strip[dy:dy + h].reshape(h * wdt, kdim)
            d = jnp.dot(xm, w_ref[dy], preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        y = (acc + b_ref[:].astype(jnp.float32)).astype(o_ref.dtype)
        o_ref[gi] = y.reshape(h, wdt, y.shape[-1])


@functools.partial(jax.jit, static_argnames=("wdt", "g", "packed"))
def _conv3x3_image(
    xp: Array, wt: Array, b: Array, *, wdt: int, g: int, packed: bool
) -> Array:
    n, hp, _, _ = xp.shape
    h = hp - 2
    cout = wt.shape[2] if packed else wt.shape[2]
    kern = (
        functools.partial(_conv_kernel_image_packed, h=h, wdt=wdt, g=g)
        if packed else
        functools.partial(
            _conv_kernel_image, h=h, wdt=wdt, cin=xp.shape[-1], g=g
        )
    )
    return pl.pallas_call(
        kern,
        grid=(n // g,),
        in_specs=[
            pl.BlockSpec(
                (g,) + xp.shape[1:], lambda nn: (nn, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (g, h, wdt, cout), lambda nn: (nn, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, wdt, cout), xp.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * wdt * 9 * (xp.shape[-1] // (3 if packed else 1))
            * cout,
            bytes_accessed=(
                xp.size * xp.dtype.itemsize
                + n * h * wdt * cout * xp.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=K._INTERPRET,
    )(xp, wt, b)


@functools.partial(jax.jit, static_argnames=("tile_h", "wdt"))
def _conv3x3_taps(
    xw: Array, wt: Array, b: Array, *, tile_h: int, wdt: int
) -> Array:
    n, h, wpad, cin = xw.shape
    cout = wt.shape[2]
    grid = (n, h // tile_h)
    nblk = h // tile_h
    xspec = lambda fi: pl.BlockSpec(  # noqa: E731
        (1, tile_h, wpad, cin),
        lambda nn, ii: (nn, jnp.clip(ii + fi, 0, nblk - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(_conv_kernel_taps, tile_h=tile_h, wdt=wdt, cin=cin),
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
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * wdt * 9 * cin * cout,
            bytes_accessed=(
                3 * xw.size * xw.dtype.itemsize
                + n * h * wdt * cout * xw.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=K._INTERPRET,
    )(xw, xw, xw, wt, b)


@functools.partial(jax.jit, static_argnames=("tile_h", "wdt"))
def _conv3x3_packed(
    x: Array, w2: Array, b: Array, *, tile_h: int, wdt: int
) -> Array:
    """Lane-packed variant: builds xcat/halos with XLA ops, then one
    single-read pallas_call."""
    n, h, _, cin = x.shape
    cout = w2.shape[2]
    nblk = h // tile_h

    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
    xcat = jnp.concatenate(
        [xp[:, :, d:d + wdt, :] for d in range(3)], axis=-1
    )  # (n, h, wdt, 3cin); xcat[..., d*cin+c] = x_pad[..., w+d, c]

    zrow = jnp.zeros((n, 1, wdt, 3 * cin), xcat.dtype)
    # top halo of block i is row i*tile_h - 1 (zero for i=0)
    xtop = jnp.concatenate(
        [zrow, xcat[:, tile_h - 1::tile_h][:, :nblk - 1]], axis=1
    )
    # bottom halo of block i is row (i+1)*tile_h (zero for the last)
    xbot = jnp.concatenate([xcat[:, tile_h::tile_h], zrow], axis=1)

    return pl.pallas_call(
        functools.partial(_conv_kernel_packed, tile_h=tile_h, wdt=wdt),
        grid=(n, nblk),
        in_specs=[
            pl.BlockSpec(
                (1, tile_h, wdt, 3 * cin),
                lambda nn, ii: (nn, ii, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, wdt, 3 * cin),
                lambda nn, ii: (nn, ii, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, wdt, 3 * cin),
                lambda nn, ii: (nn, ii, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, wdt, cout), lambda nn, ii: (nn, ii, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, wdt, cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * wdt * 9 * cin * cout,
            bytes_accessed=(
                xcat.size * xcat.dtype.itemsize
                + n * h * wdt * cout * x.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=K._INTERPRET,
    )(xcat, xtop, xbot, w2, b)


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


def conv3x3(
    x: Array, w: Array, b: Array | None = None, variant: str | None = None
) -> Array:
    """3x3/stride-1/pad-1 NHWC conv, Pallas direct kernel.

    x: (N, H, W, Cin); w: HWIO (3, 3, Cin, Cout); b: (Cout,) or None.
    Equivalent to ``lax.conv_general_dilated`` with symmetric pad 1
    (equivalence-tested in tests/test_conv_pallas.py).

    variant: 'patch' (materialized (M, 9*Cin) patch matrix in scratch),
    'taps' (nine accumulating dots on shifted values), or 'packed'
    (lane-packed xcat built outside the kernel; one HBM read). Measured
    A/B in docs/DESIGN.md.
    """
    import os

    if variant is None:
        variant = os.environ.get("RFV_CONV_VARIANT", "taps")
    n, h, wdt, cin = x.shape
    cout = w.shape[3]
    tile_h = _tile_h(h, wdt)
    assert tile_h is not None, (x.shape, w.shape)
    bb = jnp.zeros((1, cout), jnp.float32) if b is None else (
        b.astype(jnp.float32).reshape(1, cout)
    )
    if variant == "packed" and wdt % 8 == 0:
        w2 = w.astype(x.dtype).reshape(3, 3 * cin, cout)
        return _conv3x3_packed(x, w2, bb, tile_h=tile_h, wdt=wdt)
    if variant in ("image", "imagepacked") and wdt % 8 == 0:
        import os

        g = int(os.environ.get("RFV_CONV_G", "1"))
        if n % g:
            g = 1
        # Mosaic materializes the unrolled tap slices on the kernel's
        # scoped-VMEM stack (~n_taps slabs of (H*W, K) + the fp32
        # accumulator); stay under the 16 MB scoped limit or fall back to
        # the strip-tiled variant.
        n_taps, kdim = (3, 3 * cin) if variant == "imagepacked" else (9, cin)
        stack = g * (
            n_taps * h * wdt * kdim * x.dtype.itemsize
            + h * wdt * cout * 4
            + (h + 2) * _round8(wdt + 2) * kdim * x.dtype.itemsize
        )
        if stack > 12 * 2**20:
            variant = "taps"  # fall through to the strip-tiled kernel
        elif variant == "imagepacked":
            xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
            xcat = jnp.concatenate(
                [xp[:, :, d:d + wdt, :] for d in range(3)], axis=-1
            )
            xcat = jnp.pad(xcat, ((0, 0), (1, 1), (0, 0), (0, 0)))
            w2 = w.astype(x.dtype).reshape(3, 3 * cin, cout)
            return _conv3x3_image(xcat, w2, bb, wdt=wdt, g=g, packed=True)
        else:
            wpad_i = _round8(wdt + 2)
            xp = jnp.pad(
                x, ((0, 0), (1, 1), (1, 1 + wpad_i - (wdt + 2)), (0, 0))
            )
            wt = w.astype(x.dtype).reshape(9, cin, cout)
            return _conv3x3_image(xp, wt, bb, wdt=wdt, g=g, packed=False)
    # Width zero-padded (conv pad 1, rounded to the sublane tiling of 8);
    # height halos come from the neighbouring row-blocks inside the kernel.
    wpad = _round8(wdt + 2)
    xw = jnp.pad(x, ((0, 0), (0, 0), (1, 1 + wpad - (wdt + 2)), (0, 0)))
    if variant == "taps":
        wt = w.astype(x.dtype).reshape(9, cin, cout)
        return _conv3x3_taps(xw, wt, bb, tile_h=tile_h, wdt=wdt)
    wp = w.astype(x.dtype).reshape(9 * cin, cout)
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
            lambda x, w, b: jax.lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16,
            ) + b.astype(jnp.bfloat16)
        )

        y0 = ref(x, w, b)

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
        tx = bench(ref, x, w, b)
        line = f"({n},{h},{wdt},{c})->{f}: xla {tx*1e3:.3f} ms {fl/tx/1e12:.1f} TF/s"
        import os

        variants = os.environ.get(
            "RFV_CONV_BENCH", "patch,taps,packed,image,imagepacked"
        ).split(",")
        for variant in variants:
            fn = jax.jit(functools.partial(conv3x3, variant=variant))
            yv = fn(x, w, b)
            errv = float(
                jnp.max(jnp.abs(yv.astype(jnp.float32) - y0.astype(jnp.float32)))
                / jnp.max(jnp.abs(y0.astype(jnp.float32)))
            )
            tp = bench(fn, x, w, b)
            line += (
                f" | {variant} {tp*1e3:.3f} ms {fl/tp/1e12:.1f} TF/s"
                f" ({tx/tp:.2f}x, err {errv:.1e})"
            )
        print(line, flush=True)
