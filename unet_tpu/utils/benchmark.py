"""Benchmark + validation harness (the reference's dev/common.h analog).

  * `benchmark(fn, *args)` — wall-clock a jitted fn with warmup, rotating
    over multiple input copies so no rep reuses device-cached inputs (the
    TPU analog of the reference's L2 flush before every rep,
    dev/common.h:88-122).
  * `validate_result(actual, expected)` — elementwise check printing the
    first few values and aborting after >=10 faults (dev/common.h:57-86).
  * `trace(dir)` — jax.profiler context (the reference's
    cudaProfilerStart bracket, dev/unet_test.cu:2115).
"""

from __future__ import annotations

import contextlib
import time
from typing import Sequence

import jax
import numpy as np


def benchmark(fn, *args, reps: int = 20, warmup: int = 2,
              rotate: Sequence[tuple] = ()) -> dict:
    """Times `fn(*args)` (or `fn(*rotate[i % len])` when `rotate` is given).
    Returns {"mean_ms", "std_ms", "reps"}."""
    arg_sets = list(rotate) if rotate else [args]
    for i in range(warmup):
        out = fn(*arg_sets[i % len(arg_sets)])
    jax.block_until_ready(out)
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        out = fn(*arg_sets[i % len(arg_sets)])
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) * 1e3)
    arr = np.asarray(times)
    return {"mean_ms": float(arr.mean()), "std_ms": float(arr.std()),
            "reps": reps}


class ValidationError(AssertionError):
    pass


def validate_result(actual, expected, name: str = "tensor",
                    atol: float = 1e-4, print_first: int = 5,
                    max_faults: int = 10, verbose: bool = False) -> int:
    """Reference-style elementwise validation (dev/common.h:57-86):
    prints the first few element pairs, counts |a-e| > atol faults,
    raises after max_faults.  Returns the fault count."""
    a = np.asarray(actual, np.float32).ravel()
    e = np.asarray(expected, np.float32).ravel()
    if a.size != e.size:
        raise ValidationError(
            f"{name}: size mismatch {a.size} vs {e.size}")
    if verbose:
        for i in range(min(print_first, a.size)):
            print(f"{name}[{i}] actual={a[i]:.7f} expected={e[i]:.7f}")
    bad = np.abs(a - e) > atol
    n_bad = int(bad.sum())
    if n_bad:
        idx = np.nonzero(bad)[0][:max_faults]
        lines = "\n".join(
            f"  [{i}] actual={a[i]:.7f} expected={e[i]:.7f}" for i in idx)
        raise ValidationError(
            f"{name}: {n_bad}/{a.size} elements beyond atol={atol}\n"
            + lines)
    return n_bad


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace bracket; view with tensorboard or parse the
    xplane.pb."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
