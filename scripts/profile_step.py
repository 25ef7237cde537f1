"""Profile the train step on the real TPU: times pytree vs flat AdamW
paths, and optionally captures a jax.profiler trace for per-op analysis.

Usage:
  python scripts/profile_step.py [--dtype bfloat16] [--trace /tmp/tr]
          [--image_size 64] [--paths multi,flat]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--trace", default=None)
    p.add_argument("--paths", default="multi,flat")
    p.add_argument("--reps", type=int, default=4, help="timed reps of K-step scan")
    p.add_argument("--K", type=int, default=10)
    p.add_argument("--unroll", type=int, default=1)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from unet_tpu.config import TrainConfig, UnetConfig
    from unet_tpu.diffusion.gaussian import (GaussianDiffusion,
                                             named_beta_schedule)
    from unet_tpu.models import unet
    from unet_tpu.training import trainer

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)

    cfg = UnetConfig(image_size=args.image_size)
    B = 32
    K = args.K
    rng = np.random.default_rng(0)
    params = jax.jit(lambda k: unet.init(k, cfg))(jax.random.PRNGKey(0))
    diffusion = GaussianDiffusion.create(
        named_beta_schedule("linear", cfg.max_period))
    tc = TrainConfig(batch_size=B, compute_dtype=args.dtype)
    S = cfg.image_size

    def chunks(n=2):
        return [jnp.stack([jnp.asarray(rng.standard_normal(
            (B, S, S, 3)).astype(np.float32) * 0.5) for _ in range(K)])
            for _ in range(n)]

    results = {}

    from unet_tpu.utils.benchmark import _drain

    def run(name, ms_fn, state):
        cs = chunks()
        t0 = time.perf_counter()
        state, losses = ms_fn(state, cs[0])
        _drain(losses)
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f} s",
              file=sys.stderr)
        t0 = time.perf_counter()
        for i in range(args.reps):
            state, losses = ms_fn(state, cs[i % 2])
        _drain(losses)
        ms = (time.perf_counter() - t0) / (args.reps * K) * 1e3
        results[name] = ms
        print(f"{name}: {ms:.2f} ms/step", file=sys.stderr)
        return state, ms_fn, cs

    paths = args.paths.split(",")
    traced = None
    if "multi" in paths:
        ms_fn = trainer.make_multi_step(cfg, tc, diffusion,
                                        unroll=args.unroll)
        state = trainer.init_state(jax.tree.map(jnp.array, params))
        traced = run("multi(pytree)", ms_fn, state)
    if "flat" in paths:
        fstate, unravel = trainer.flatten_state(params)
        fms_fn = trainer.make_flat_multi_step(cfg, tc, unravel, diffusion)
        traced = run("flat", fms_fn, fstate)

    if args.trace and traced is not None:
        state, ms_fn, cs = traced
        with jax.profiler.trace(args.trace):
            state, losses = ms_fn(state, cs[0])
            _drain(losses)  # block_until_ready returns early on axon;
            #                 stop_trace before completion truncates it
        print(f"trace written to {args.trace}", file=sys.stderr)

    print(results)


if __name__ == "__main__":
    main()
