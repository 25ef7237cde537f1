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
import sys
import time
from typing import Sequence

import jax
import numpy as np


def _drain(out) -> float:
    """Force the device queue to drain: a scalar reduction of the LAST
    output, fetched to host.  TPUs execute queued programs in submission
    order, so this waits for every dispatched rep.  (On the tunneled
    axon platform `jax.block_until_ready` does NOT reliably block, and a
    full-array fetch pays the tunnel's bandwidth — a scalar readback is
    the only sound sync primitive there.)"""
    import jax.numpy as jnp
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def benchmark(fn, *args, reps: int = 20, warmup: int = 2,
              rotate: Sequence[tuple] = (), chunks: int = 4) -> dict:
    """Times `fn(*args)` (or `fn(*rotate[i % len])` when `rotate` is given).
    Returns {"mean_ms", "std_ms", "reps"}.

    Reps are dispatched pipelined in `chunks` groups, each group ending
    with one scalar-readback sync whose round-trip latency is measured
    and subtracted — per-rep host syncs would add the full tunnel RTT
    (~33 ms on this machine's axon link) to every rep.  Numbers below
    ~0.1 ms/op remain RTT-jitter-bound; use utils.benchmark.trace for
    those."""
    arg_sets = list(rotate) if rotate else [args]
    for i in range(max(warmup, 1)):
        out = fn(*arg_sets[i % len(arg_sets)])
    _drain(out)
    # median sync round-trip, subtracted from each chunk below
    rtts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _drain(out)
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    per_chunk = max(1, reps // chunks)
    times = []
    i = 0
    for _ in range(chunks):
        t0 = time.perf_counter()
        for _ in range(per_chunk):
            out = fn(*arg_sets[i % len(arg_sets)])
            i += 1
        _drain(out)
        times.append(max(time.perf_counter() - t0 - rtt, 0.0)
                     / per_chunk * 1e3)
    arr = np.asarray(times)
    return {"mean_ms": float(arr.mean()), "std_ms": float(arr.std()),
            "reps": per_chunk * chunks}


class ValidationError(AssertionError):
    pass


def validate_result(actual, expected, name: str = "tensor",
                    atol: float = 1e-4, print_first: int = 5,
                    max_faults: int = 10, verbose: bool = False,
                    raise_on_fault: bool = True) -> int:
    """Reference-style elementwise validation (dev/common.h:57-86):
    prints the first few element pairs and counts |a-e| > atol faults.
    Raises ValidationError on ANY fault (listing at most the first
    max_faults offenders) unless raise_on_fault=False, in which case the
    fault count is returned for the caller to report."""
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
        msg = (f"{name}: {n_bad}/{a.size} elements beyond atol={atol}\n"
               + lines)
        if raise_on_fault:
            raise ValidationError(msg)
        print(msg, file=sys.stderr)
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
