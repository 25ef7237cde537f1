"""Trajectory parity against the REFERENCE'S OWN model code.

tests/test_train.py proves 10/100-step AdamW parity against
tests/torch_ref.py — a mirror derived from our `param_order`, which by
construction cannot catch a systematic ordering bug shared by both sides.
This file closes that loophole (round-3 VERDICT item 3): the torch side is
`ref.UNetModel` imported from /root/reference itself, initialized by the
reference's init, exported through the reference's own
`save_model_params_to_bin`, loaded here through the interchange path, and
trained for 10 real AdamW steps (lr=1e-3, wd=0.01 — the reference's
dev/unet_test.py:255 tier) on shared MT19937 draws (dev/rand.h strategy).
Losses and final flat params must agree at the dev/unet_test tolerance
tiers (dev/unet_test.cu:2085 uses 1e-2 end-to-end).
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
ref = pytest.importorskip("train_unet")

import jax.numpy as jnp  # noqa: E402

from unet_tpu.config import TrainConfig  # noqa: E402
from unet_tpu.diffusion.gaussian import (GaussianDiffusion,  # noqa: E402
                                         named_beta_schedule)
from unet_tpu.io import checkpoint as ckpt_io  # noqa: E402
from unet_tpu.training import trainer  # noqa: E402

N_STEPS = 10


def test_trajectory_parity_vs_real_reference(small_cfg, rng, tmp_path):
    """10 AdamW steps: ref.UNetModel (torch, reference init) vs our trainer
    from the same .bin, same MT19937 timestep/noise stream."""
    pytest.importorskip("unet_tpu.utils.native")
    from unet_tpu.utils.native import TorchRng

    torch.manual_seed(11)
    rmodel = ref.UNetModel(small_cfg.in_channels, small_cfg.model_channels,
                           small_cfg.out_channels,
                           small_cfg.num_res_blocks,
                           small_cfg.attention_ds,
                           num_head_channels=small_cfg.num_head_channels)
    rmodel.train()

    # reference init -> reference's own writer -> our interchange loader
    path = str(tmp_path / "ref_traj_init.bin")
    ref.save_model_params_to_bin(rmodel, path, B=4,
                                 C_in=small_cfg.in_channels,
                                 C_model=small_cfg.model_channels,
                                 C_out=small_cfg.out_channels,
                                 H=small_cfg.image_size,
                                 W=small_cfg.image_size,
                                 max_period=small_cfg.max_period)
    params = ckpt_io.load(path, cfg=small_cfg).params

    B, S, T = 4, small_cfg.image_size, small_cfg.max_period
    diffusion = GaussianDiffusion.create(named_beta_schedule("linear", T))
    sqrt_ac = np.asarray(diffusion.sqrt_alphas_cumprod)
    sqrt_1mac = np.asarray(diffusion.sqrt_one_minus_alphas_cumprod)
    batches = rng.standard_normal((N_STEPS, B, 3, S, S),
                                  dtype=np.float32) * 0.5

    # --- torch side: the reference model under the reference's dev tier
    # optimizer (dev/unet_test.py:255 lr=1e-3; wd=0.01 as unet_test.cu:2108)
    torch.manual_seed(123)
    opt = torch.optim.AdamW(rmodel.parameters(), lr=1e-3, weight_decay=0.01)
    torch_losses = []
    for i in range(N_STEPS):
        opt.zero_grad()
        ts = torch.floor(torch.rand(B) * T).float()
        noise = torch.zeros(B, 3, S, S)
        noise.normal_()
        ti = ts.long().numpy()
        a = torch.tensor(sqrt_ac[ti])[:, None, None, None]
        b = torch.tensor(sqrt_1mac[ti])[:, None, None, None]
        x_t = a * torch.tensor(batches[i]) + b * noise
        # the reference's timestep calling convention is (B, 1)
        # (dev/unet_test.py:298)
        out = rmodel(x_t, ts.view(B, 1))
        loss = torch.mean((out - noise) ** 2)
        loss.backward()
        opt.step()
        torch_losses.append(float(loss.detach()))

    # --- jax side: identical draws via the native MT19937
    try:
        hrng = TorchRng(123)
    except Exception as e:  # pragma: no cover - native build missing
        pytest.skip(f"native build unavailable: {e}")
    tc = TrainConfig(batch_size=B, lr=1e-3, weight_decay=0.01)
    _, step_with = trainer.make_train_step(small_cfg, tc, diffusion,
                                           donate=False)
    state = trainer.init_state(params)
    jax_losses = []
    for i in range(N_STEPS):
        ts = hrng.timesteps(B, T)
        noise = hrng.normal((B, 3, S, S)).transpose(0, 2, 3, 1)
        state, loss = step_with(
            state, jnp.asarray(batches[i].transpose(0, 2, 3, 1)),
            jnp.asarray(ts), jnp.asarray(noise))
        jax_losses.append(float(loss))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-3)
    assert jax_losses[-1] < jax_losses[0], "training must reduce loss"

    # final params after 10 compounding AdamW steps: the reference's
    # end-to-end tier is 1e-2 (dev/unet_test.cu:2085); 5e-3 as in
    # test_train.py's self-mirror variant.
    final_jax = ckpt_io.flatten_params(state.params, small_cfg)
    final_torch = np.concatenate(
        [p.detach().numpy().ravel() for p in rmodel.parameters()])
    np.testing.assert_allclose(final_jax, final_torch, atol=5e-3)
