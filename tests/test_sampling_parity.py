"""End-to-end SAMPLING parity against the reference's own generate.py.

The north star's last clause ("bit-comparable sample quality from
generate.py") needs the full ancestral chain compared across frameworks,
not just single forwards (round-3 VERDICT item 2).  Here the torch side is
the reference's actual `generate.sample_next_step` (generate.py:29-52)
driving the reference's actual `UNetModel`, looped exactly as
generate.py:77-80 does; our side is `ddpm_sample`'s one-jit fori_loop fed
the IDENTICAL noise sequence through its `noise=` table (the torch draws
are reconstructed from the same `torch.manual_seed`, since
`torch.randn_like` consumes the global MT19937 in draw order).

Weights travel reference-init -> save_model_params_to_bin -> our loader,
so the test covers loader + model + chain in one shot.  T=100 keeps the
full chain CPU-tractable (98 model calls per side); the production-scale
998-step run on a trained checkpoint lives in
scripts/sampling_parity_demo.py with its committed artifact in docs/.

NOTE on magnitudes: an untrained model's eps is uncorrelated with x, so
the chain amplifies (the 1/sqrt(1-beta_t) product alone is ~e^5 for
T=100): values reach O(1000), and per-step f32 divergence is amplified
the same way.  The comparison is therefore tiered: a short prefix at
tight absolute tolerance (catches systematic errors) plus the full chain
relative to the realized scale (catches gross divergence).
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
ref = pytest.importorskip("train_unet")
gen = pytest.importorskip("generate")  # the reference's own sampler code

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from unet_tpu.config import UnetConfig  # noqa: E402
from unet_tpu.diffusion.gaussian import (GaussianDiffusion,  # noqa: E402
                                         named_beta_schedule)
from unet_tpu.diffusion import sampler  # noqa: E402
from unet_tpu.io import checkpoint as ckpt_io  # noqa: E402

T = 100
B = 2
SEED = 314


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    # NB: max_period stays 1000 — the reference model's timestep embedding
    # hardcodes it (train_unet.py:467) independent of the chain length T.
    cfg = UnetConfig(model_channels=32, image_size=32, attention_ds=(4, 8),
                     num_head_channels=32)
    torch.manual_seed(5)
    rmodel = ref.UNetModel(3, cfg.model_channels, 3, cfg.num_res_blocks,
                           cfg.attention_ds,
                           num_head_channels=cfg.num_head_channels)
    rmodel.eval()
    path = str(tmp_path_factory.mktemp("samp") / "init.bin")
    ref.save_model_params_to_bin(rmodel, path, B=B, C_model=32,
                                 H=cfg.image_size, W=cfg.image_size)
    params = ckpt_io.load(path, cfg=cfg).params

    # shared draws, reconstructed exactly as generate.py consumes them:
    # x_init first (generate.py:74), then one randn_like per step
    # (generate.py:52), all from the global MT19937.
    torch.manual_seed(SEED)
    x_init_t = torch.randn(B, 3, cfg.image_size, cfg.image_size)
    noise_t = torch.stack([torch.randn_like(x_init_t)
                           for _ in range(T - 2)])
    return cfg, rmodel, params, x_init_t, noise_t


def test_ddpm_chain_matches_reference_generate(setup):
    """Full T=100 ancestral chain, identical noise: the reference's
    generate.py loop vs our single-jit fori_loop."""
    cfg, rmodel, params, x_init_t, noise_t = setup

    betas_np = ref.get_named_beta_schedule("linear", T)
    ref_diff = ref.GaussianDiffusion(betas=betas_np)
    betas = torch.tensor(betas_np, dtype=torch.float32)
    abar = torch.tensor(ref_diff.alphas_cumprod)

    # --- torch side: generate.py:77-80, verbatim loop over the
    # reference's own sample_next_step
    torch.manual_seed(SEED)
    _ = torch.randn(B, 3, cfg.image_size, cfg.image_size)  # = x_init draw
    x_ref = x_init_t.clone()
    PREFIX = 10
    x_ref_prefix = None
    with torch.no_grad():
        for i, t in enumerate(range(T - 1, 1, -1)):
            # generate.py:79 passes t as a [[t]] tensor; its (1,1) shape
            # broadcasts over any batch inside the model and the update.
            t_tensor = torch.tensor([[t]])
            x_ref = gen.sample_next_step(x_ref, t_tensor, rmodel, T,
                                         betas, abar)
            if i + 1 == PREFIX:
                x_ref_prefix = x_ref.numpy().transpose(0, 2, 3, 1).copy()
    x_ref = x_ref.numpy().transpose(0, 2, 3, 1)

    # --- our side: same chain as ONE jitted fori_loop with the noise table
    diffusion = GaussianDiffusion.create(named_beta_schedule("linear", T))
    noise = jnp.asarray(noise_t.numpy().transpose(0, 1, 3, 4, 2))
    x_init = jnp.asarray(x_init_t.numpy().transpose(0, 2, 3, 1))

    def run(n):
        return np.asarray(jax.jit(
            lambda p, xi, nz: sampler.ddpm_sample(
                p, cfg, diffusion, jax.random.PRNGKey(0), batch_size=B,
                x_init=xi, noise=nz, num_steps=n),
            static_argnums=()) (params, x_init, noise))

    x_ours_prefix = run(PREFIX)
    x_ours = run(None)

    # sanity: the torch loop must have consumed exactly the reconstructed
    # noise table (one randn_like per step)
    assert noise_t.shape[0] == T - 2
    assert np.isfinite(x_ref).all() and np.isfinite(x_ours).all()

    # Tier 1 — 10-step prefix, tight: any systematic error in the
    # recurrence, the beta/abar tables, the timestep convention, or the
    # noise alignment shows up here far above f32 drift.
    s10 = float(np.abs(x_ref_prefix).max())
    np.testing.assert_allclose(x_ours_prefix, x_ref_prefix,
                               atol=2e-5 * s10, rtol=0)

    # Tier 2 — full 98-step chain: with an UNTRAINED model the chain is
    # an amplifier (prod 1/sqrt(1-beta_t) ~ e^5 for T=100), so per-step
    # f32 rounding compounds chaotically on both sides.  A systematic
    # bug (wrong beta table, off-by-one t, wrong embedding base)
    # diverges by orders of magnitude under that same amplification.
    scale = float(np.abs(x_ref).max())
    np.testing.assert_allclose(x_ours, x_ref, atol=3e-2 * scale, rtol=0)


def test_ddim50_matches_reference_model_chain(setup):
    """DDIM-50 (eta=0, deterministic): our sampler vs the same recurrence
    driven through the reference's real UNetModel.  The recurrence is
    re-stated in torch here (the reference ships no DDIM), so what this
    proves is 50-step cross-framework MODEL parity under the DDIM update
    — complementing the DDPM test above where the loop itself is the
    reference's code."""
    cfg, rmodel, params, x_init_t, _ = setup

    diffusion = GaussianDiffusion.create(named_beta_schedule("linear", T))
    abar_np = np.asarray(diffusion.alphas_cumprod, np.float64)
    num_steps = 50
    ts = np.unique(np.linspace(1, T - 1, num_steps)
                   .round().astype(np.int64))[::-1]
    a_cur = abar_np[ts - 1]
    a_prev = np.concatenate([abar_np[ts[1:] - 1], [1.0]])

    x = x_init_t.clone()
    with torch.no_grad():
        for i, t in enumerate(ts):
            eps = rmodel(x, torch.full((B, 1), float(t)))
            a_t, a_p = float(a_cur[i]), float(a_prev[i])
            x0 = (x - np.sqrt(1.0 - a_t) * eps) / np.sqrt(a_t)
            x = np.sqrt(a_p) * x0 + np.sqrt(1.0 - a_p) * eps
    x_ref = x.numpy().transpose(0, 2, 3, 1)

    x_init = jnp.asarray(x_init_t.numpy().transpose(0, 2, 3, 1))
    x_ours = np.asarray(jax.jit(lambda p, xi: sampler.ddim_sample(
        p, cfg, diffusion, jax.random.PRNGKey(0), num_steps=num_steps,
        batch_size=B, x_init=xi))(params, x_init))

    scale = max(float(np.abs(x_ref).max()), 1.0)
    np.testing.assert_allclose(x_ours, x_ref, atol=2e-4 * scale, rtol=0)
