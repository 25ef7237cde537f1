"""Per-block-type timing readout: resblocks vs attention.

The reference threads res/attn timers through its dev forward/backward
walk and prints a two-bucket decomposition (dev/unet_test.cu:2090-2103;
README.md:563-569 "UNet 32.8 = resblocks 28.4 + attention 3.9").  A
jitted XLA program has no per-block timers to thread, so this script
measures the same decomposition differentially: the full model vs an
attention-free plan (attention_ds=()) with identical conv/res topology —
the difference is the attention bucket.  Fusion boundaries shift
slightly between the two programs, so treat the split as accurate to a
few percent; scripts/trace_buckets.py gives the exact per-op view from
a profiler trace when that matters.

Usage:  python scripts/block_timing.py [--image_size 64] [--dtype bfloat16]
        [--backward] [--reps 40]

Prints, per image size:  unet_fwd, resblocks(+head), attention, and with
--backward the same split for the fwd+bwd step.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--reps", type=int, default=40)
    p.add_argument("--backward", action="store_true",
                   help="also decompose the fwd+bwd pass")
    args = p.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache_tpu"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from unet_tpu.config import UnetConfig
    from unet_tpu.models import unet
    from unet_tpu.ops import functional as F
    from unet_tpu.utils.benchmark import benchmark

    B, S = args.batch, args.image_size
    dtype = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)

    def measure(cfg, label, backward):
        params = jax.jit(lambda k: unet.init(k, cfg))(jax.random.PRNGKey(0))
        t = jnp.zeros((B,), jnp.float32)
        batches = [jnp.asarray(rng.standard_normal(
            (B, S, S, 3)).astype(np.float32) * 0.5) for _ in range(4)]
        if backward:
            def loss(pp, x, tt):
                out = unet.apply(pp, cfg, x, tt, compute_dtype=dtype)
                return F.mse_loss(out.astype(jnp.float32), x)
            fn = jax.jit(jax.grad(loss))
        else:
            fn = jax.jit(lambda pp, x, tt: unet.apply(
                pp, cfg, x, tt, compute_dtype=dtype))
        r = benchmark(fn, reps=args.reps,
                      rotate=[(params, b, t) for b in batches])
        print(f"  {label}: {r['mean_ms']:.2f} ms "
              f"(± {r['std_ms']:.2f})", file=sys.stderr)
        return r["mean_ms"]

    cfg = UnetConfig(image_size=S)
    cfg_na = UnetConfig(image_size=S, attention_ds=())

    passes = [("forward", False)] + ([("fwd+bwd", True)]
                                     if args.backward else [])
    for name, backward in passes:
        full = measure(cfg, f"{name} full model", backward)
        noatt = measure(cfg_na, f"{name} attention-free plan", backward)
        print(f"{name} @ {S}x{S} B={B} {args.dtype}: "
              f"unet {full:.2f} ms = resblocks(+head) {noatt:.2f} "
              f"+ attention {full - noatt:.2f} ms "
              f"({100 * (full - noatt) / full:.1f}%)")


if __name__ == "__main__":
    main()
