"""Experiment (negative result, kept as the record): Pallas
implicit-GEMM 3x3 conv on the (H, W, B, C) view.

Hypothesis: XLA's C_out=64 convs run at 45-70 TF/s (trace-measured in
situ) against a 98 TF/s N=64-lane ceiling, so a Pallas implicit-GEMM
kernel — fed through the logical transpose (B,H,W,C) -> (H,W,B,C) whose
default layout is byte-identical to the {3,0,2,1} layout XLA gives conv
activations, i.e. zero-copy — might reclaim the gap.  The kernel builds
im2col patch groups in VMEM (pixel shifts = static sublane rotates of B
positions + edge masks = implicit zero padding) and runs (TH*W*B, 3C) @
(3C, O) MXU matmuls per ky tap group.

Measured outcome on the v5e: the kernel reaches only ~20 TF/s — patch
assembly (rotate+mask+concat VPU copies) and halo-row re-DMA dominate,
and it CANNOT beat XLA's in-situ convs, which additionally fuse the
GroupNorm prologue, bias/residual epilogues and the AdamW update into
the same fusion and prefetch weights to VMEM.  Conclusion recorded in
docs/PARITY.md: XLA's conv pipeline wins at every shape this model has;
Pallas pays off where XLA materializes large intermediates instead
(attention at T>=512, ops/pallas/attention.py).

Usage: python scripts/conv_proto.py [--bench]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _conv_kernel(top_ref, mid_ref, bot_ref, w_ref, b_ref, out_ref, *,
                 TH: int, W: int, B: int, C: int, O: int, H: int):
    """mid_ref: (TH, W, B, C) output rows; top_ref/bot_ref: (1, W, B, C)
    halo rows (clamped at image edges; masked below), w_ref: (9C, O)."""
    i = pl.program_id(0)
    M = TH * W * B
    f32 = jnp.float32

    # flattened (TH*W*B) patch-row coordinates
    ridx = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    wpix = ridx // B % W           # w coordinate
    hrel = ridx // (W * B)         # row within the TH chunk

    mid = mid_ref[...].reshape(M, C)
    row = W * B
    acc = b_ref[...].astype(f32)[None, :] * jnp.ones((M, 1), f32)
    for ky in range(3):
        patches = []
        if ky == 0:
            base = (top_ref[...].reshape(row, C) if TH == 1 else
                    jnp.concatenate([top_ref[...].reshape(row, C),
                                     mid[:M - row]], axis=0))
        elif ky == 1:
            base = mid
        else:
            base = (bot_ref[...].reshape(row, C) if TH == 1 else
                    jnp.concatenate([mid[row:],
                                     bot_ref[...].reshape(row, C)],
                                    axis=0))
        # global input row = i*TH + ky - 1 + hrel; clamped halo rows
        # outside the image are masked = the conv's zero padding
        grow = i * TH + (ky - 1) + hrel
        rowbad = (grow < 0) | (grow >= H)
        for kx in range(3):
            if kx == 0:
                # static one-pixel rotate (down): row p reads base[p-B]
                sh = jnp.concatenate([base[M - B:], base[:M - B]], axis=0)
                bad = rowbad | (wpix == 0)
            elif kx == 2:
                sh = jnp.concatenate([base[B:], base[:B]], axis=0)
                bad = rowbad | (wpix == W - 1)
            else:
                sh = base
                bad = rowbad
            sh = jnp.where(bad, jnp.zeros((), base.dtype), sh)
            patches.append(sh)
        pat = jnp.concatenate(patches, axis=1)       # (M, 3C)
        acc = acc + jnp.dot(pat, w_ref[3 * C * ky:3 * C * (ky + 1)],
                            preferred_element_type=f32)
    out_ref[...] = acc.reshape(TH, W, B, O).astype(out_ref.dtype)


def conv3x3_hwbc(x, w, b, *, TH=2):
    """x: (H, W, B, C); w: (3, 3, C, O) HWIO; b: (O,) -> (H, W, B, O).

    Grid over row chunks; halo rows come from a zero-padded copy so every
    block read is a clean slice.
    """
    H, W, B, C = x.shape
    O = w.shape[-1]
    wmat = w.reshape(9 * C, O).astype(x.dtype)
    kernel = functools.partial(_conv_kernel, TH=TH, W=W, B=B, C=C, O=O,
                               H=H)
    return pl.pallas_call(
        kernel,
        grid=(H // TH,),
        in_specs=[
            # top halo row (i*TH - 1), clamped at the top edge (masked in
            # the kernel); block size 1 on dim 0 makes block == element
            # units so the index map can address single rows
            pl.BlockSpec((1, W, B, C),
                         lambda i: (jnp.maximum(i * TH - 1, 0), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TH, W, B, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # bottom halo row (i*TH + TH), clamped at the bottom edge
            pl.BlockSpec((1, W, B, C),
                         lambda i: (jnp.minimum(i * TH + TH, H - 1),
                                    0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * C, O), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((O,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TH, W, B, O), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W, B, O), x.dtype),
        interpret=_interpret(),
    )(x, x, x, wmat, b)


def conv3x3_ref(x_hwbc, w, b):
    x = jnp.transpose(x_hwbc, (2, 0, 1, 3))
    y = lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.transpose(y + b, (1, 2, 0, 3))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--bench", action="store_true")
    args = p.parse_args()
    rng = np.random.default_rng(0)

    # correctness (small, f32, interpret on CPU)
    H, W, B, C, O = 8, 8, 4, 64, 64
    x = jnp.asarray(rng.standard_normal((H, W, B, C)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, C, O)).astype(np.float32)
                    * 0.05)
    b = jnp.asarray(rng.standard_normal(O).astype(np.float32))
    out = conv3x3_hwbc(x, w, b)
    ref = conv3x3_ref(x, w, b)
    err = float(jnp.abs(out - ref).max())
    print(f"correctness (f32 {H}x{W}x{B}x{C}->{O}): max err {err:.2e}")
    assert err < 1e-4

    if not args.bench:
        return

    def bench(fn, *a, reps=30):
        # pipelined-chunk timing with scalar-readback drain:
        # block_until_ready does not reliably block on the tunneled
        # axon platform (see utils/benchmark.py)
        from unet_tpu.utils.benchmark import benchmark
        return benchmark(fn, *a, reps=reps)["mean_ms"]

    for (C, O, TH) in [(64, 64, 2), (192, 64, 1), (128, 64, 2),
                       (64, 128, 2), (128, 128, 1), (320, 128, 1)]:
        # C>=128 channel counts occur after downsampling in the model
        H = W = 64 if C * 64 <= 192 * 64 else 32
        B = 32
        x = jnp.asarray(rng.standard_normal(
            (H, W, B, C)).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal(
            (3, 3, C, O)).astype(np.float32) * 0.05).astype(jnp.bfloat16)
        bb = jnp.zeros((O,), jnp.bfloat16)
        f_pl = jax.jit(functools.partial(conv3x3_hwbc, TH=TH))
        f_x = jax.jit(conv3x3_ref)
        t_pl = bench(f_pl, x, w, bb)
        t_x = bench(f_x, x, w, bb)
        gflop = 2 * H * W * B * C * O * 9 / 1e9
        print(f"C{C}->O{O} @ {H}x{W} B{B}: pallas {t_pl:.3f} ms "
              f"({gflop / t_pl:.1f} TF/s) | xla(+2 transposes) "
              f"{t_x:.3f} ms")


if __name__ == "__main__":
    main()
