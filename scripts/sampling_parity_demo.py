"""Production-scale cross-framework SAMPLING parity demo (round-3 VERDICT
item 2's committed artifact).

Loads ONE trained checkpoint into BOTH frameworks and drives the FULL
998-step ancestral chain (T=1000) through each with the IDENTICAL noise
sequence:

  * torch side: the reference's own `generate.sample_next_step`
    (/root/reference/generate.py:29-52) looped exactly as
    generate.py:77-80 does, on CPU, with the reference `UNetModel`
    populated by the generate.py:17-27 named_parameters walk over our
    .bin (the moments/EMA/rng extension trailing the params is ignored by
    that walk, exactly as the reference loader ignores it);
  * our side: `ddpm_sample`'s single-jit fori_loop on the TPU, fed the
    same noise through its `noise=` table (f32, Precision.HIGHEST).

The torch draws are reconstructed from the same `torch.manual_seed`
(randn_like consumes the global MT19937 in draw order: x_init first,
then one (B,3,64,64) normal per step).

Outputs: a side-by-side PNG grid (row 1 reference / row 2 ours / row 3
amplified |diff|), plus max-abs-diff / PSNR / uint8 agreement printed and
appended to the .txt next to the grid.  Also renders our DDIM-50 images
from the same checkpoint + x_init for the grid's last row (no reference
analog; eta=0 so no noise table needed).

Usage:
  python scripts/sampling_parity_demo.py --model_weights models/demo/model_10000.bin \
      --out docs/sampling_parity [--batch 2] [--seed 314]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model_weights", required=True)
    p.add_argument("--out", default="docs/sampling_parity")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--seed", type=int, default=314)
    args = p.parse_args()

    import torch
    import train_unet as ref
    import generate as gen
    import jax
    import jax.numpy as jnp
    from unet_tpu.diffusion.gaussian import (GaussianDiffusion,
                                             named_beta_schedule)
    from unet_tpu.diffusion import sampler
    from unet_tpu.io import checkpoint as ckpt_io

    ckpt = ckpt_io.load(args.model_weights)
    cfg = ckpt.cfg
    T, S, B = cfg.max_period, cfg.image_size, args.batch
    print(f"checkpoint: step {ckpt.step}, {S}x{S}, T={T}")

    # --- shared noise, reconstructed exactly as generate.py consumes it
    torch.manual_seed(args.seed)
    x_init_t = torch.randn(B, 3, S, S)
    noise_t = torch.stack([torch.randn_like(x_init_t)
                           for _ in range(T - 2)])

    # --- our side on the TPU (f32, Precision.HIGHEST)
    diffusion = GaussianDiffusion.create(named_beta_schedule(
        ckpt.noise_schedule or "linear", T))
    x_init = jnp.asarray(x_init_t.numpy().transpose(0, 2, 3, 1))
    noise = jnp.asarray(noise_t.numpy().transpose(0, 1, 3, 4, 2))
    t0 = time.perf_counter()
    x_ours = np.asarray(jax.jit(lambda p, xi, nz: sampler.ddpm_sample(
        p, cfg, diffusion, jax.random.PRNGKey(0), batch_size=B,
        x_init=xi, noise=nz))(ckpt.params, x_init, noise))
    print(f"ours (TPU, one jit, incl. compile): "
          f"{time.perf_counter() - t0:.1f} s")

    ddim_ours = np.asarray(jax.jit(lambda p, xi: sampler.ddim_sample(
        p, cfg, diffusion, jax.random.PRNGKey(0), num_steps=50,
        batch_size=B, x_init=xi))(ckpt.params, x_init))

    # --- reference side on CPU: generate.py's own loader walk + loop
    rmodel = ref.UNetModel(cfg.in_channels, cfg.model_channels,
                           cfg.out_channels, cfg.num_res_blocks,
                           cfg.attention_ds,
                           num_head_channels=cfg.num_head_channels)
    gen.load_model_weights(rmodel, args.model_weights)
    rmodel.eval()
    betas_np = ref.get_named_beta_schedule(
        ckpt.noise_schedule or "linear", T)
    rdiff = ref.GaussianDiffusion(betas=betas_np)
    betas = torch.tensor(betas_np, dtype=torch.float32)
    abar = torch.tensor(rdiff.alphas_cumprod)

    torch.manual_seed(args.seed)
    _ = torch.randn(B, 3, S, S)  # == x_init draw
    x_ref = x_init_t.clone()
    t0 = time.perf_counter()
    with torch.no_grad():
        for i, t in enumerate(range(T - 1, 1, -1)):
            x_ref = gen.sample_next_step(x_ref, torch.tensor([[t]]),
                                         rmodel, T, betas, abar)
            if (i + 1) % 100 == 0:
                print(f"  reference chain {i + 1}/{T - 2} "
                      f"({time.perf_counter() - t0:.0f} s)", flush=True)
    print(f"reference (torch CPU, generate.py loop): "
          f"{time.perf_counter() - t0:.1f} s")
    x_ref = x_ref.numpy().transpose(0, 2, 3, 1)

    # --- metrics
    diff = np.abs(x_ours - x_ref)
    u_ref = sampler.to_uint8(x_ref)
    u_ours = sampler.to_uint8(x_ours)
    udiff = np.abs(u_ref.astype(np.int32) - u_ours.astype(np.int32))
    mse = float(np.mean((x_ours - x_ref) ** 2))
    psnr = 10 * np.log10(4.0 / mse) if mse > 0 else float("inf")
    lines = [
        f"checkpoint {args.model_weights} (step {ckpt.step}), B={B}, "
        f"seed {args.seed}, full {T - 2}-step chain",
        f"float image: max|diff| {diff.max():.4e}, "
        f"mean|diff| {diff.mean():.4e}, PSNR {psnr:.1f} dB "
        f"(range [-1,1] -> peak 2.0)",
        f"uint8 image: {100.0 * np.mean(udiff == 0):.2f}% identical "
        f"pixels, {100.0 * np.mean(udiff <= 1):.2f}% within +-1, "
        f"max diff {udiff.max()}",
    ]
    print("\n".join(lines))

    # --- side-by-side grid
    from PIL import Image
    rows = [u_ref, u_ours,
            np.clip(diff * (255.0 / max(float(diff.max()), 1e-8)), 0,
                    255).astype(np.uint8),
            sampler.to_uint8(ddim_ours)]
    labels = "rows: reference(CPU) | ours(TPU) | |diff| amplified | " \
             "ours DDIM-50"
    pad = 2
    gh = len(rows) * (S + pad) - pad
    gw = B * (S + pad) - pad
    grid = np.full((gh, gw, 3), 255, np.uint8)
    for r, row in enumerate(rows):
        for b in range(B):
            grid[r * (S + pad):r * (S + pad) + S,
                 b * (S + pad):b * (S + pad) + S] = row[b]
    Image.fromarray(grid).resize((gw * 2, gh * 2),
                                 Image.NEAREST).save(args.out + ".png")
    with open(args.out + ".txt", "w") as f:
        f.write("\n".join([labels] + lines) + "\n")
    print(f"wrote {args.out}.png / .txt")


if __name__ == "__main__":
    main()
