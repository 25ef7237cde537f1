"""Sampling CLI (reference generate.py CLI surface).

python -m unet_tpu.cli.generate --model_filename models/model_10000.bin \
    [--output_filename sample.jpg] [--batch_size 1] [--seed 0]

Loads a .bin checkpoint (ours or one written by the reference CUDA/torch
trainers — same interchange format) and runs the jitted DDPM sampler.
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from unet_tpu.diffusion.gaussian import GaussianDiffusion, named_beta_schedule
from unet_tpu.diffusion.sampler import make_sampler, to_uint8
from unet_tpu.io import checkpoint as ckpt_io
from unet_tpu.utils.args import add_dict_to_argparser


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, dict(
        model_filename="", output_filename="sample.jpg",
        batch_size=1, seed=0, compute_dtype="float32",
        use_ema=False,   # sample the EMA weights (train.py --ema_rate)
        sampler="ddpm",  # "ddpm" (998-step ancestral, the reference
        #                  path) or "ddim" (fast deterministic sampling)
        ddim_steps=50,
        ddim_eta=0.0,
        class_label=-1,      # >= 0: class-conditional sampling with this
        #                      label (checkpoint must carry label_emb,
        #                      i.e. trained with --class_cond)
        guidance_scale=1.0,  # classifier-free guidance weight w:
        #                      eps_u + w*(eps_c - eps_u); needs
        #                      --class_label; train with --label_dropout
        noise_schedule=""))  # "" = the schedule recorded in the
    #                          checkpoint (header[40]; "linear" for
    #                          reference-written files); pass
    #                          linear/cosine to override old checkpoints
    args = parser.parse_args(argv)
    if not args.model_filename:
        parser.error("--model_filename is required")
    if args.sampler not in ("ddpm", "ddim"):
        parser.error(f"unknown sampler {args.sampler!r}")
    if args.guidance_scale != 1.0 and args.class_label < 0:
        parser.error("--guidance_scale needs --class_label")
    if args.noise_schedule not in ("", "linear", "cosine"):
        parser.error(f"unknown schedule {args.noise_schedule!r}")

    ckpt = ckpt_io.load(args.model_filename)
    schedule = args.noise_schedule or ckpt.noise_schedule or "linear"
    diffusion = GaussianDiffusion.create(
        named_beta_schedule(schedule, ckpt.cfg.max_period))
    if args.sampler == "ddim":
        T = diffusion.num_timesteps
        if not 1 <= args.ddim_steps <= T - 1:
            parser.error(f"--ddim_steps must be in [1, {T - 1}] for this "
                         f"model's {T}-step schedule")
    y = args.class_label if args.class_label >= 0 else None
    if y is not None and "label_emb" not in ckpt.params:
        parser.error(f"{args.model_filename} is unconditional (no "
                     "label_emb); train with --class_cond for "
                     "--class_label")
    if y is not None and y >= ckpt.params["label_emb"].shape[0]:
        parser.error(f"--class_label {y} out of range "
                     f"(num_classes={ckpt.params['label_emb'].shape[0]})")
    if args.use_ema:
        if ckpt.ema is None:
            parser.error(f"{args.model_filename} carries no EMA weights "
                         "(train with --ema_rate > 0)")
        ckpt.params = ckpt.ema
    cfg = ckpt.cfg
    if args.sampler == "ddim":
        from unet_tpu.diffusion.sampler import make_ddim_sampler
        sampler = make_ddim_sampler(
            cfg, diffusion, num_steps=args.ddim_steps, eta=args.ddim_eta,
            batch_size=args.batch_size,
            compute_dtype=np.dtype(args.compute_dtype),
            y=y, guidance_scale=args.guidance_scale)
    else:
        sampler = make_sampler(cfg, diffusion, batch_size=args.batch_size,
                               compute_dtype=np.dtype(args.compute_dtype),
                               y=y, guidance_scale=args.guidance_scale)
    images = sampler(ckpt.params, jax.random.PRNGKey(args.seed))
    arr = to_uint8(images)  # (B, H, W, C)

    from PIL import Image
    if args.batch_size == 1:
        Image.fromarray(arr[0]).save(args.output_filename)
    else:
        # grid: rows of up to 8
        b, h, w, c = arr.shape
        cols = min(b, 8)
        rows = (b + cols - 1) // cols
        grid = np.zeros((rows * h, cols * w, c), np.uint8)
        for i in range(b):
            r, cl = divmod(i, cols)
            grid[r * h:(r + 1) * h, cl * w:(cl + 1) * w] = arr[i]
        Image.fromarray(grid).save(args.output_filename)
    print(f"Saved sample to {args.output_filename}")


if __name__ == "__main__":
    main()
