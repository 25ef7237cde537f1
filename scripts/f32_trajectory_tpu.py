"""TPU-side f32 trajectory parity + timing across MXU precision modes.

The on-hardware version of tests/test_train.py::test_training_trajectory
_parity (which runs on the CPU backend, where f32 matmuls are exact and
the MXU pass-count question never arises).  Here the 10 AdamW steps run
on the real TPU at each UNET_TPU_F32_PRECISION mode and are compared to
the torch-CPU trajectory at the reference tolerance (loss rtol 2e-3, the
analog of dev/unet_test.cu:2129's eyeballed loss table) — evidence for
which f32 mode is trajectory-faithful, recorded in PARITY.md.

Usage: python scripts/f32_trajectory_tpu.py [--modes highest,high,default]
       [--steps 10] [--batch 4]
Runs the FULL ImageNet-64 model config (reference production model).
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
    p.add_argument("--modes", default="highest,high")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--batch", type=int, default=4)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import torch

    from unet_tpu.config import TrainConfig, UnetConfig
    from unet_tpu.diffusion.gaussian import (GaussianDiffusion,
                                             named_beta_schedule)
    from unet_tpu.io import checkpoint as ckpt_io
    from unet_tpu.models import unet
    from unet_tpu.ops import functional as F
    from unet_tpu.training import trainer

    from tests.torch_ref import TorchUnet

    cfg = UnetConfig()  # the reference production ImageNet-64 model
    N, B, S, T = args.steps, args.batch, cfg.image_size, cfg.max_period
    rng = np.random.default_rng(0)

    params = jax.jit(lambda k: unet.init(k, cfg))(jax.random.PRNGKey(0))
    flat = ckpt_io.flatten_params(params, cfg)
    diffusion = GaussianDiffusion.create(named_beta_schedule("linear", T))
    sqrt_ac = np.asarray(diffusion.sqrt_alphas_cumprod)
    sqrt_1mac = np.asarray(diffusion.sqrt_one_minus_alphas_cumprod)

    batches = rng.standard_normal((N, B, 3, S, S), dtype=np.float32) * 0.5
    noises = rng.standard_normal((N, B, 3, S, S), dtype=np.float32)
    tsteps = rng.integers(0, T, size=(N, B))

    # --- torch ground truth (CPU, exact f32) — the dev/unet_test torch
    # side (lr=1e-3, wd=0.01: dev/unet_test.py:255)
    print("torch CPU trajectory...", file=sys.stderr, flush=True)
    tmodel = TorchUnet(cfg, flat)
    opt = torch.optim.AdamW(tmodel.params, lr=1e-3, weight_decay=0.01)
    torch_losses = []
    for i in range(N):
        opt.zero_grad()
        a = torch.tensor(sqrt_ac[tsteps[i]])[:, None, None, None].float()
        b = torch.tensor(sqrt_1mac[tsteps[i]])[:, None, None, None].float()
        x_t = a * torch.tensor(batches[i]) + b * torch.tensor(noises[i])
        out = tmodel.forward(x_t, torch.tensor(tsteps[i]).float())
        loss = torch.mean((out - torch.tensor(noises[i])) ** 2)
        loss.backward()
        opt.step()
        torch_losses.append(float(loss))
        print(f"  torch step {i}: {float(loss):.6f}", file=sys.stderr,
              flush=True)

    tc = TrainConfig(batch_size=B, lr=1e-3, weight_decay=0.01)
    results = {}
    for mode in args.modes.split(","):
        F.set_f32_precision(mode)
        _, step_with = trainer.make_train_step(cfg, tc, diffusion,
                                               donate=False)
        state = trainer.init_state(jax.tree.map(jnp.array, params))
        jax_losses = []
        t0 = time.perf_counter()
        for i in range(N):
            state, loss = step_with(
                state, jnp.asarray(batches[i].transpose(0, 2, 3, 1)),
                jnp.asarray(tsteps[i]),
                jnp.asarray(noises[i].transpose(0, 2, 3, 1)))
            jax_losses.append(float(loss))
        dt = time.perf_counter() - t0
        rel = np.max(np.abs(np.asarray(jax_losses)
                            - np.asarray(torch_losses))
                     / np.asarray(torch_losses))
        ok = rel < 2e-3
        results[mode] = (rel, ok)
        print(f"mode={mode}: max loss rel err {rel:.2e} "
              f"{'PASS' if ok else 'FAIL'} (2e-3 bar), "
              f"{dt:.1f}s incl compile", flush=True)
        for i, (jl, tl) in enumerate(zip(jax_losses, torch_losses)):
            print(f"  step {i}: jax {jl:.6f} torch {tl:.6f}",
                  file=sys.stderr)
    print(results)


if __name__ == "__main__":
    main()
