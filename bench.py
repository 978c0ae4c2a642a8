"""Headline benchmark: few-step Euler sampling throughput on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: images/sec at 4-step Euler sampling of the reference's default
config (64x64, 11.3M-param UNet). Baseline: the reference's committed run
artifact — 272.96 ms/img = 3.6635 img/s at 4 steps
(reference: results/benchmark_results.csv row num_steps=4; hardware
unrecorded, likely CPU — the only measured numbers the reference ships).

The sampler is the framework's fused lax.scan executable (bf16 model
compute, Pallas kernels on TPU); throughput is measured at a large batch
with warmup excluded and block_until_ready closing each timed window.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

BASELINE_IMG_PER_SEC_4STEP = 3.6635  # reference results/benchmark_results.csv:4


class _PauseBackgroundRuns:
    """SIGSTOP any live background artifact-queue workers while timing.

    The driver may invoke bench.py while a long training queue
    (tools/queue_r3*.sh, pidfiles /tmp/queue_*.pid) still owns the single
    TPU chip; timesharing would distort the headline number. Processes are
    found by walking exact child PIDs from the recorded queue PIDs (never
    by name pattern) and are SIGCONT'd on exit. RFV_BENCH_NO_PAUSE=1
    disables this.
    """

    @property
    def PIDFILES(self):
        return sorted(str(p) for p in Path("/tmp").glob("queue_*.pid"))

    def __init__(self) -> None:
        self.paused: list[int] = []

    @staticmethod
    def _descendants(root: int) -> list[int]:
        import os

        kids: dict[int, list[int]] = {}
        for entry in os.listdir("/proc"):
            if not entry.isdigit():
                continue
            try:
                with open(f"/proc/{entry}/stat") as f:
                    ppid = int(f.read().split(")")[-1].split()[1])
            except (OSError, ValueError, IndexError):
                continue
            kids.setdefault(ppid, []).append(int(entry))
        out, stack = [], [root]
        while stack:
            pid = stack.pop()
            out.append(pid)
            stack.extend(kids.get(pid, []))
        return out

    def __enter__(self):
        import os
        import signal

        if os.environ.get("RFV_BENCH_NO_PAUSE"):
            return self
        for pidfile in self.PIDFILES:
            try:
                root = int(Path(pidfile).read_text().strip())
            except (OSError, ValueError):
                continue
            for pid in self._descendants(root):
                try:
                    os.kill(pid, signal.SIGSTOP)
                    self.paused.append(pid)
                except (ProcessLookupError, PermissionError):
                    pass
        return self

    def __exit__(self, *exc):
        import os
        import signal

        for pid in reversed(self.paused):
            try:
                os.kill(pid, signal.SIGCONT)
            except (ProcessLookupError, PermissionError):
                pass
        return False


def main() -> None:
    import signal

    import jax
    import jax.numpy as jnp

    from rectified_flow_vision_tpu.models import BaseFlowModel

    image_size = 64
    num_steps = 4
    batch = 256 if jax.default_backend() == "tpu" else 16
    num_runs = 5

    # SIGTERM (e.g. `timeout`) must still run the finally block below, or a
    # paused background queue would stay SIGSTOPped forever.
    signal.signal(signal.SIGTERM, lambda *_: sys.exit(143))

    with _PauseBackgroundRuns():
        model = BaseFlowModel(image_size=image_size)  # default = ref config

        key = jax.random.key(0)
        noise = jax.random.normal(
            key, (batch, image_size, image_size, 3), jnp.float32
        )
        sampler = model._get_sampler(num_steps, False, model.sample_dtype)

        # Warmup: compile the scan executable; scalar fetch forces
        # completion (under remote-execution tunnels block_until_ready can
        # return before the device finishes, so all timing here closes over
        # a dependency chain ended by a scalar readback).
        x = sampler(model.params, noise)
        float(jnp.sum(x))

        chain = 8  # iterations per timed window, output feeding next input
        times = []
        for _ in range(num_runs):
            t0 = time.perf_counter()
            x = noise
            for _ in range(chain):
                x = sampler(model.params, x)
            float(jnp.sum(x))  # sync
            times.append((time.perf_counter() - t0) / chain)

    best = min(times)
    img_per_sec = batch / best

    print(
        json.dumps(
            {
                "metric": f"img_per_sec_{image_size}x{image_size}_{num_steps}step_euler",
                "value": round(img_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC_4STEP, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
