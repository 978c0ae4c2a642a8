"""Microbenchmark: Winograd F(2x2,3x3) vs XLA direct conv on TPU.

Times the UNet's stride-1 3x3 conv shapes (the sampler's dominant cost,
docs/DESIGN.md) in bf16 at the production batch. Methodology matches
bench.py: dependency-chained iterations per timed window, scalar readback
to close the window (remote-execution tunnels can return early from
block_until_ready).

Usage: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python tools/bench_winograd.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from rectified_flow_vision_tpu.ops.primitives import conv2d, conv_init
from rectified_flow_vision_tpu.ops.winograd import conv2d_winograd

# (H, W, Cin, Cout) at batch 256 — the flagship UNet's stride-1 3x3 convs
# (encoder/decoder res-blocks at channel_mult [1,2,4], models/unet.py).
SHAPES = [
    (64, 64, 64, 64),
    (32, 32, 128, 128),
    (16, 16, 256, 256),
    (64, 64, 128, 64),   # decoder post-concat
    (32, 32, 256, 128),
]
BATCH = 256
CHAIN = 8
RUNS = 5


def time_fn(fn, params, x):
    # x and output have identical shape only when Cin == Cout; otherwise
    # chain through a re-projection-free loop by reusing the input.
    out = fn(x, params)
    float(jnp.sum(out))  # compile + sync
    times = []
    same_shape = out.shape == x.shape
    for _ in range(RUNS):
        t0 = time.perf_counter()
        cur = x
        acc = None
        for _ in range(CHAIN):
            acc = fn(cur, params)
            if same_shape:
                cur = acc
            else:
                # keep the dependency: fold a scalar of the output back in
                cur = x + jnp.float32(0) * acc[..., :1].sum()
        float(jnp.sum(acc))
        times.append((time.perf_counter() - t0) / CHAIN)
    return min(times)


def main():
    print(f"backend={jax.default_backend()} batch={BATCH} dtype=bfloat16")
    header = f"{'shape':>22} {'direct ms':>10} {'wino ms':>10} {'speedup':>8} {'eq-TFLOP/s':>11}"
    print(header)
    for h, w, cin, cout in SHAPES:
        p = conv_init(jax.random.key(0), 3, 3, cin, cout)
        p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
        x = jax.random.normal(
            jax.random.key(1), (BATCH, h, w, cin), jnp.bfloat16
        )
        t_direct = time_fn(conv2d, p, x)
        t_wino = time_fn(conv2d_winograd, p, x)
        flops = 2 * 9 * BATCH * h * w * cin * cout  # direct-conv FLOPs
        print(
            f"{BATCH}x{h}x{w}x{cin}->{cout:>4} "
            f"{t_direct * 1e3:>10.2f} {t_wino * 1e3:>10.2f} "
            f"{t_direct / t_wino:>7.2f}x {flops / t_wino / 1e12:>11.1f}"
        )


if __name__ == "__main__":
    main()
