"""Dissect real-training wall time into its host phases.

The production loop (cli/train.py multi path) per 100-step chunk:
  dispatch multi(state, chunk_N)     [async]
  assemble chunk_N+1                 [C++ loader gather -> uint8 rows]
  device_put chunk_N+1               [H2D through the tunnel]
  np.asarray(losses_N)               [blocks until the device finishes]

Wall ms/step = max(device, assemble+upload) if the overlap works;
anything above that is serialization to attack.  This script times each
phase separately on the real TPU with the same loader/step the CLI uses.

Usage: python scripts/profile_input_pipeline.py --data_file /tmp/demo64.bin
         [--chunks 8] [--k 100] [--image_size 64]
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
    p.add_argument("--data_file", default="/tmp/demo64.bin")
    p.add_argument("--chunks", type=int, default=8)
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--ema_rate", type=float, default=0.999)
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
    from unet_tpu.config import TrainConfig, UnetConfig
    from unet_tpu.models import unet
    from unet_tpu.training import trainer
    from unet_tpu.utils.native import NativeAugmentedLoader

    cfg = UnetConfig(image_size=args.image_size)
    tc = TrainConfig(batch_size=args.batch_size, compute_dtype="bfloat16",
                     ema_rate=args.ema_rate, shuffle=True)
    B, S, k = args.batch_size, args.image_size, args.k
    loader = NativeAugmentedLoader(args.data_file, B, shuffle=True,
                                   flip=True, seed=0)
    multi = trainer.make_multi_step(cfg, tc, input_u8=True)
    params = jax.jit(lambda key: unet.init(key, cfg))(jax.random.PRNGKey(0))
    state = trainer.init_state(jax.tree.map(jnp.array, params),
                               ema_rate=tc.ema_rate)

    def assemble():
        out = np.empty((k, B, S, S, 3), np.uint8)
        for j in range(k):
            loader.next_into(out[j])
        return out

    # warmup/compile
    chunk = jax.device_put(assemble())
    state, losses = multi(state, chunk)
    np.asarray(losses)

    t_disp, t_asm, t_put, t_drain, t_total = [], [], [], [], []
    nxt = jax.device_put(assemble())
    for _ in range(args.chunks):
        t0 = time.perf_counter()
        state, losses = multi(state, nxt)
        t1 = time.perf_counter()
        host = assemble()
        t2 = time.perf_counter()
        nxt = jax.device_put(host)
        t3 = time.perf_counter()
        np.asarray(losses)
        t4 = time.perf_counter()
        t_disp.append(t1 - t0)
        t_asm.append(t2 - t1)
        t_put.append(t3 - t2)
        t_drain.append(t4 - t3)
        t_total.append(t4 - t0)

    def ms(v):
        return np.mean(v) / k * 1e3

    print(f"per-step means over {args.chunks} x {k}-step chunks "
          f"({args.image_size}px, B={B}):")
    print(f"  dispatch:        {ms(t_disp):.2f} ms (async enqueue; a "
          "per-chunk retrace would show up here)")
    print(f"  assemble (C++):  {ms(t_asm):.2f} ms")
    print(f"  device_put:      {ms(t_put):.2f} ms")
    print(f"  loss drain:      {ms(t_drain):.2f} ms (device-step remainder)")
    print(f"  TOTAL wall:      {ms(t_total):.2f} ms/step")
    print(f"  -> host (asm+put) {ms(t_asm) + ms(t_put):.2f} vs drain "
          f"{ms(t_drain):.2f}: overlap "
          f"{'works' if ms(t_drain) > 0.2 else 'exhausted'}")


if __name__ == "__main__":
    main()
