"""Per-op / per-block micro-benchmarks on the current jax backend.

The analog of the reference's dev/<op>.cu benchmark mains
(SURVEY.md section 2.7) — same shapes as the published conv table
(reference README.md:524-529: conv3x3 C_in=192 -> C_out=64 at 64x64) so
numbers are directly comparable.

Run on the TPU:  python scripts/bench_ops.py [--dtype bfloat16]
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from unet_tpu.models import blocks
from unet_tpu.ops import functional as F
from unet_tpu.utils.benchmark import benchmark


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--reps", type=int, default=50)
    args = p.parse_args()
    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    B = 32

    def t(*shape):
        return jnp.asarray(rng.standard_normal(shape), dt)

    print(f"backend={jax.default_backend()} dtype={dt.name} B={B}")

    # Rotation discipline: every timed rep reads a distinct input batch
    # (the reference flushes L2 before each rep, dev/common.h:88-122).
    N_ROT = 4

    # conv3x3 192->64 @64x64 — the reference's headline kernel shape
    xs = [t(B, 64, 64, 192) for _ in range(N_ROT)]
    w = t(3, 3, 192, 64) * 0.05
    b = t(64)
    conv = jax.jit(F.conv2d)
    r = benchmark(conv, reps=args.reps, rotate=[(x, w, b) for x in xs])
    print(f"conv3x3 192->64 @64x64 fwd: {r['mean_ms']:.3f} ms "
          f"(ref v3 1.31 / torch 0.457 ms fp32 on 4090)")

    grad = jax.jit(jax.grad(lambda x, w, b: jnp.sum(
        F.conv2d(x, w, b).astype(jnp.float32) ** 2), argnums=(0, 1, 2)))
    r = benchmark(grad, reps=args.reps, rotate=[(x, w, b) for x in xs])
    print(f"conv3x3 192->64 @64x64 fwd+bwd: {r['mean_ms']:.3f} ms "
          f"(ref bwd v1 15.46 / torch 2.34 ms)")

    # groupnorm+silu @ the largest slab
    xs = [t(B, 64, 64, 64) for _ in range(N_ROT)]
    g, be = jnp.ones(64, dt), jnp.zeros(64, dt)
    gn = jax.jit(lambda x, g, b: F.group_norm_silu(x, g, b))
    r = benchmark(gn, reps=args.reps, rotate=[(x, g, be) for x in xs])
    print(f"groupnorm+silu @64x64x64 fwd: {r['mean_ms']:.3f} ms "
          f"(standalone; in-situ XLA fuses it into the consumer convs — "
          f"docs/PERF.md)")

    # attention block @16x16x192 (first attention resolution)
    ap = blocks.attention_init(jax.random.PRNGKey(0), 192)
    ap = jax.tree.map(lambda a: a.astype(dt), ap)
    xs = [t(B, 16, 16, 192) for _ in range(N_ROT)]
    attn = jax.jit(lambda p, x: blocks.attention_apply(p, x, head_size=32))
    r = benchmark(attn, reps=args.reps, rotate=[(ap, x) for x in xs])
    print(f"attention block @16x16x192 fwd: {r['mean_ms']:.3f} ms")

    # attention core @T=1024 (the 128x128 stretch shape: 32x32 spatial,
    # C=192, HS=32) — fused Pallas kernel vs XLA einsums, fwd and
    # fwd+bwd.  This is the stage that pinned the 128px step at ~5% of
    # MXU peak on XLA (scores materialized in HBM).
    if jax.default_backend() == "tpu" and dt == jnp.bfloat16:
        from unet_tpu.ops.pallas.attention import qkv_attention_fused
        T, C, NH = 1024, 192, 6
        qs = [t(B, T, 3 * C) for _ in range(N_ROT)]
        dout = t(B, T, C)
        for name, fn in (("xla", lambda q: F.set_attn_mode("xla") or
                          F.qkv_attention(q, NH)),
                         ("pallas", lambda q: qkv_attention_fused(q, NH))):
            fwd = jax.jit(fn)
            r = benchmark(fwd, reps=min(args.reps, 20),
                          rotate=[(q,) for q in qs])
            gfn = jax.jit(jax.grad(lambda q: jnp.sum(
                fn(q).astype(jnp.float32) * dout.astype(jnp.float32))))
            rg = benchmark(gfn, reps=min(args.reps, 20),
                           rotate=[(q,) for q in qs])
            print(f"attention core T=1024 C=192 {name}: "
                  f"fwd {r['mean_ms']:.3f} ms, fwd+bwd {rg['mean_ms']:.3f} ms")
        F.set_attn_mode("auto")

    # resblock @64x64 64->64
    rp = blocks.resblock_init(jax.random.PRNGKey(1), 64, 64, 256)
    rp = jax.tree.map(lambda a: a.astype(dt), rp)
    xs = [t(B, 64, 64, 64) for _ in range(N_ROT)]
    emb = t(B, 256)
    res = jax.jit(lambda p, x, e: blocks.resblock_apply(p, x, e))
    r = benchmark(res, reps=args.reps, rotate=[(rp, x, emb) for x in xs])
    print(f"resblock 64->64 @64x64 fwd: {r['mean_ms']:.3f} ms")


if __name__ == "__main__":
    main()
