"""Benchmark: full training step on the reference production config.

Prints the headline JSON line to stdout IMMEDIATELY after the headline
measurement (and re-prints it, enriched, as extras land), so a driver
timeout can never starve the one number this script exists to produce:

  {"metric": "imagenet64_train_step_ms", "value": <ms>, "unit": "ms",
   "vs_baseline": <59.20 / ms>, ...}

vs_baseline > 1.0 means faster than the reference's best published number
(59.20 ms/step, PyTorch + torch.compile on RTX 4090, fp32, B=32 —
reference README.md:8-12, BASELINE.md).  That headline is bf16 (the
TPU-native precision); the like-for-like fp32 comparison is the
`f32_3pass_*` keys (3-pass bf16x3 matmuls, the tf32 analog — passes the
reference trajectory test at exact-f32 fidelity, docs/PARITY.md).

Robustness contract (round-4 post-mortem: the driver killed the old
single-JSON-at-the-end layout before it printed anything):
  * stdout carries ONLY JSON lines; all narration goes to stderr.
  * The headline line is printed+flushed right after the headline
    measurement.  Every later section try/excepts, re-emits the enriched
    line when it lands, and is skipped when the wall-clock budget
    (UNET_TPU_BENCH_BUDGET_S, default 480 s) has insufficient headroom.
  * SIGTERM/SIGINT emit the current line before exiting, so even a
    `timeout` kill mid-extra flushes everything measured so far.
  * flops_per_step / mfu come from the analytic model-FLOPs count
    (models/unet.fwd_flops × 3) — the old extra cost_analysis compile
    (~5 min cold on this 1-core host) is gone.  mfu is emitted for the
    bf16 headline only: fp32 3-pass runs at 1/3 the bf16 MXU peak, so a
    bf16-peak MFU would be the wrong ceiling for it.

Benchmark discipline: jit-warmup first (compile excluded), then mean over
timed reps; every timed step consumes a distinct pre-staged batch so no
rep reuses device-cached inputs (the reference flushes L2 between reps
for the same reason, dev/common.h:88-122).  Sync is scalar readback —
`jax.block_until_ready` does not reliably block on the tunneled axon
platform (see utils/benchmark.py).
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys
import time

import numpy as np

_T0 = time.perf_counter()


def _elapsed() -> float:
    return time.perf_counter() - _T0


def verify_pallas_kernels() -> int:
    """Validate the Mosaic-COMPILED Pallas kernels on the real device
    against the XLA paths (the CPU suite only covers interpret mode).
    Mirrors the reference's on-device per-kernel validation
    (dev/common.h:57-86 + per-op mains).  Shapes: the 128x128 production
    attention shape (B=32, T=1024, C=192, HS=32), the reference
    dev/attention.cu core shape (B=4, T=1024, C=256, HS=32,
    dev/attention.cu:370-375), and the model's GroupNorm slabs.
    Prints per-tensor fault counts to stderr; returns the total fault
    count (0 = all kernels device-verified)."""
    import jax
    import jax.numpy as jnp
    from unet_tpu.ops import functional as F
    from unet_tpu.ops.pallas.attention import qkv_attention_fused
    from unet_tpu.ops.pallas.groupnorm import group_norm_act
    from unet_tpu.utils.benchmark import validate_result

    rng = np.random.default_rng(3)
    total = 0

    def check(name, actual, expected, tol=3e-2):
        nonlocal total
        e = np.asarray(expected, np.float32)
        atol = tol * max(1.0, float(np.abs(e).max()))
        # raise_on_fault=False: a faulting kernel must surface as a
        # nonzero pallas_verify_faults in the JSON line, not abort the
        # bench after the headline was already measured
        n = validate_result(actual, e, name=name, atol=atol,
                            raise_on_fault=False)
        total += n
        print(f"verify {name}: {n} faults (atol={atol:.3g})",
              file=sys.stderr)

    for B, T, C, NH in [(32, 1024, 192, 6), (4, 1024, 256, 8)]:
        qkv = jnp.asarray(rng.standard_normal((B, T, 3 * C))
                          .astype(np.float32)).astype(jnp.bfloat16)
        dout = jnp.asarray(rng.standard_normal((B, T, C))
                           .astype(np.float32)).astype(jnp.bfloat16)

        # restore the user's UNET_TPU_ATTN (fall back to auto if the env
        # var held an unrecognized value — set_attn_mode would assert)
        prev_mode = (F._ATTN_MODE if F._ATTN_MODE in ("auto", "fused",
                                                      "xla") else "auto")
        F.set_attn_mode("xla")
        try:
            ref_out = jax.jit(lambda q: F.qkv_attention(q, NH))(qkv)
            ref_g = jax.jit(jax.grad(lambda q: jnp.sum(
                (F.qkv_attention(q, NH) * dout)
                .astype(jnp.float32))))(qkv)
        finally:
            F.set_attn_mode(prev_mode)
        out = jax.jit(lambda q: qkv_attention_fused(q, NH))(qkv)
        g = jax.jit(jax.grad(lambda q: jnp.sum(
            (qkv_attention_fused(q, NH) * dout)
            .astype(jnp.float32))))(qkv)
        tag = f"attn[B={B},T={T},C={C}]"
        check(f"{tag} out", out, ref_out)
        check(f"{tag} dqkv", g, ref_g)

    for B, H, W, C in [(32, 64, 64, 64), (32, 16, 16, 192)]:
        x = jnp.asarray(rng.standard_normal((B, H, W, C))
                        .astype(np.float32)).astype(jnp.bfloat16)
        gamma = jnp.asarray(1 + 0.3 * rng.standard_normal(C)
                            .astype(np.float32)).astype(jnp.bfloat16)
        beta = jnp.asarray(0.2 * rng.standard_normal(C)
                           .astype(np.float32)).astype(jnp.bfloat16)
        dout = jnp.asarray(rng.standard_normal((B, H, W, C))
                           .astype(np.float32)).astype(jnp.bfloat16)
        # f32 XLA ground truth (the kernel's two-pass fp32 stats contract)
        xf, gf, bf = (a.astype(jnp.float32) for a in (x, gamma, beta))
        ref_out = jax.jit(lambda x, g, b: F.silu(F.group_norm(
            x, g, b, num_groups=32)))(xf, gf, bf)
        ref_gs = jax.jit(jax.grad(lambda x, g, b: jnp.sum(
            F.silu(F.group_norm(x, g, b, num_groups=32))
            * dout.astype(jnp.float32)), argnums=(0, 1, 2)))(xf, gf, bf)
        out = jax.jit(lambda x, g, b: group_norm_act(
            x, g, b, 32, 1e-5, "silu"))(x, gamma, beta)
        gs = jax.jit(jax.grad(lambda x, g, b: jnp.sum(
            (group_norm_act(x, g, b, 32, 1e-5, "silu") * dout)
            .astype(jnp.float32)), argnums=(0, 1, 2)))(x, gamma, beta)
        tag = f"gn[B={B},{H}x{W},C={C}]"
        check(f"{tag} out", out, ref_out)
        for nm, a, e in zip(("dx", "dgamma", "dbeta"), gs, ref_gs):
            check(f"{tag} {nm}", a, e)
    return total


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dtype", default="bfloat16",
                        choices=["bfloat16", "float32"],
                        help="headline compute dtype (bf16 = TPU-native "
                             "mixed precision, fp32 accumulate).  For "
                             "float32, UNET_TPU_F32_PRECISION=highest|"
                             "high|default picks 6/3/1 MXU passes "
                             "(exact-f32 / ~f32 / bf16 quality)")
    parser.add_argument("--reps", type=int, default=40)
    parser.add_argument("--image_size", type=int, default=64,
                        help="64 = the reference benchmark config; 128 = "
                             "the BASELINE stretch goal")
    parser.add_argument("--remat", action="store_true")
    parser.add_argument("--budget_s", type=float, default=float(
        os.environ.get("UNET_TPU_BENCH_BUDGET_S", "480")),
                        help="wall-clock budget; extras whose estimated "
                             "cost exceeds the remaining budget are "
                             "skipped (the headline always runs)")
    parser.add_argument("--secondary", action="store_true",
                        help="also measure the other compute dtype, "
                             "fwd-only, and the B=32 sampler (stderr "
                             "only; ~3 extra compiles)")
    parser.add_argument("--no-secondary", action="store_true",
                        help="(default) kept for compatibility")
    parser.add_argument("--no-stretch", action="store_true",
                        help="skip the 128x128 stretch-config measurement "
                             "(BASELINE.md:30)")
    parser.add_argument("--no-verify", action="store_true",
                        help="skip the on-device Pallas kernel validation "
                             "(runs by default on TPU)")
    parser.add_argument("--no-f32", action="store_true",
                        help="skip the like-for-like f32 3-pass step")
    args = parser.parse_args()

    import jax
    try:
        # persistent compile cache (~5 min per big program on this
        # 1-core host otherwise); must go through jax.config because
        # the env-var route is dead once sitecustomize has imported jax
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(
                              os.path.abspath(__file__)), ".jax_cache_tpu"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from unet_tpu.config import TrainConfig, UnetConfig
    from unet_tpu.diffusion.gaussian import (GaussianDiffusion,
                                             named_beta_schedule)
    from unet_tpu.diffusion.sampler import make_ddim_sampler, make_sampler
    from unet_tpu.models import unet
    from unet_tpu.training import trainer
    from unet_tpu.utils.benchmark import _drain, benchmark

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)

    cfg = UnetConfig(image_size=args.image_size)
    B = 32  # reference production batch
    rng = np.random.default_rng(0)
    params = jax.jit(lambda k: unet.init(k, cfg))(jax.random.PRNGKey(0))
    diffusion = GaussianDiffusion.create(
        named_beta_schedule("linear", cfg.max_period))

    S = cfg.image_size

    def peak_flops_per_s():
        """bf16 peak of the attached chip, for the MFU denominator."""
        kind = getattr(jax.devices()[0], "device_kind", "").lower()
        table = {"v5 lite": 197e12, "v5e": 197e12, "v4": 275e12,
                 "v5p": 459e12, "v5": 459e12, "v6 lite": 918e12,
                 "v6e": 918e12}
        for k, v in table.items():
            if k in kind:
                return v
        return None

    def bench_step(dtype_name, K=10):
        # production path: K steps scanned into one XLA program
        # (amortizes per-dispatch host overhead, ~3 ms/step on this host)
        tc = TrainConfig(batch_size=B, compute_dtype=dtype_name,
                         remat=args.remat)
        ms_fn = trainer.make_multi_step(cfg, tc, diffusion)
        state = trainer.init_state(
            jax.tree.map(jnp.array, params))  # private copy: step donates
        # Every timed step consumes a DISTINCT batch (two alternating
        # K-stacks of unique data) — the L2-flush discipline of the
        # reference benchmark harness (dev/common.h:88-122): no rep may
        # reuse device-cached inputs.
        chunks = [jnp.stack([jnp.asarray(rng.standard_normal(
            (B, S, S, 3)).astype(np.float32) * 0.5) for _ in range(K)])
            for _ in range(2)]
        state, losses = ms_fn(state, chunks[0])   # warmup/compile
        _drain(losses)
        state, losses = ms_fn(state, chunks[1])   # post-compile warmup
        _drain(losses)
        t0 = time.perf_counter()
        n = max(2, args.reps // K)
        for i in range(n):
            state, losses = ms_fn(state, chunks[i % 2])
        _drain(losses)  # scalar readback: block_until_ready does not
        #                 reliably block on the tunneled axon platform
        return (time.perf_counter() - t0) / (n * K) * 1e3

    # ------------------------------------------------------------------
    # Headline measurement -> emit IMMEDIATELY.
    headline_ms = bench_step(args.dtype)
    print(f"train_step {args.dtype}: {headline_ms:.2f} ms "
          f"(t={_elapsed():.0f}s)", file=sys.stderr)

    baseline_ms = 59.20  # torch.compile full step, RTX 4090 (BASELINE.md)
    out = {
        "metric": f"imagenet{args.image_size}_train_step_ms",
        "value": round(headline_ms, 2),
        "unit": "ms",
        "vs_baseline": round(baseline_ms / headline_ms, 3),
        # analytic model FLOPs: fwd contractions × 3 (fwd+dgrad+wgrad)
        "flops_per_step": 3 * unet.fwd_flops(cfg, B),
    }
    peak = peak_flops_per_s()
    if peak is not None and args.dtype == "bfloat16":
        # bf16 only: fp32 3-pass runs each contraction 3x, so the bf16
        # peak is the wrong MFU ceiling for it (ADVICE r4)
        out["mfu"] = round(
            out["flops_per_step"] / (headline_ms / 1e3) / peak, 4)

    def emit():
        print(json.dumps(out), flush=True)

    emit()

    # On a driver kill mid-extra, flush whatever has landed so far.
    def _on_term(signum, frame):  # pragma: no cover - signal path
        print(f"signal {signum}: emitting current results and exiting",
              file=sys.stderr)
        emit()
        os._exit(0)

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, _on_term)
        except Exception:
            pass

    # ------------------------------------------------------------------
    # Extras, in descending importance.  Each is skipped when the budget
    # lacks headroom for its warm-cache cost estimate (cold compiles eat
    # budget naturally via _elapsed), and re-emits the JSON on success.
    def run_extra(name, est_s, fn):
        if _elapsed() + est_s > args.budget_s:
            print(f"skip {name}: {_elapsed():.0f}s elapsed + ~{est_s:.0f}s"
                  f" > {args.budget_s:.0f}s budget", file=sys.stderr)
            return
        try:
            fn()
            emit()
        except Exception as e:
            print(f"{name} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
        print(f"after {name}: t={_elapsed():.0f}s", file=sys.stderr)

    def x_verify():
        if jax.default_backend() == "tpu":
            out["pallas_verify_faults"] = verify_pallas_kernels()

    def x_f32():
        # Like-for-like f32 numbers (the baseline is an fp32 measurement,
        # BASELINE.md): 3-pass bf16x3 ("high", the tf32 analog — passes
        # the 10-step trajectory test at exact-f32 fidelity,
        # docs/PARITY.md).
        from jax import lax
        from unet_tpu.ops import functional as F
        prev_prec = {lax.Precision.HIGHEST: "highest",
                     lax.Precision.HIGH: "high",
                     lax.Precision.DEFAULT: "default"}[F._F32_PRECISION]
        F.set_f32_precision("high")
        try:
            f32_ms = bench_step("float32")
        finally:
            F.set_f32_precision(prev_prec)  # restore the env-selected
            #                                 mode, not hardcoded highest
        print(f"train_step float32 (3-pass): {f32_ms:.2f} ms",
              file=sys.stderr)
        out["f32_3pass_train_step_ms"] = round(f32_ms, 2)
        out["f32_3pass_vs_baseline"] = round(baseline_ms / f32_ms, 3)
        # the honest headline-adjacent ratio: fp32 vs the fp32 baseline
        out["vs_baseline_like_for_like"] = out["f32_3pass_vs_baseline"]

    def x_b1_sampler():
        # B=1 998-step chain: BASELINE.md:26-30 defines the samples/sec
        # metric as the generate.py-equivalent path (998 sequential B=1
        # forwards, reference generate.py:77-80).
        sampler1 = make_sampler(cfg, diffusion, batch_size=1,
                                compute_dtype=jnp.dtype(args.dtype))
        imgs = sampler1(params, jax.random.PRNGKey(0))  # compile
        _drain(imgs)
        t0 = time.perf_counter()
        b1_reps = 3
        for i in range(b1_reps):
            imgs = sampler1(params, jax.random.PRNGKey(1 + i))
        _drain(imgs)
        b1_s = (time.perf_counter() - t0) / b1_reps
        print(f"ddpm_sample B=1 ({cfg.max_period - 2} steps): {b1_s:.3f} s"
              f" = {1 / b1_s:.3f} samples/s", file=sys.stderr)
        out["ddpm_b1_sample_s"] = round(b1_s, 3)
        out["ddpm_b1_samples_per_s"] = round(1 / b1_s, 3)

    def x_ddim():
        # DDIM-50 B=1: the fast-sampling serving path
        # (diffusion/sampler.py ddim_sample; no reference analog —
        # generate.py only runs the full ancestral chain).
        ddim1 = make_ddim_sampler(cfg, diffusion, num_steps=50,
                                  batch_size=1,
                                  compute_dtype=jnp.dtype(args.dtype))
        imgs = ddim1(params, jax.random.PRNGKey(0))  # compile
        _drain(imgs)
        t0 = time.perf_counter()
        reps = 20  # a ~23 ms quantity on an RTT-jittery link: amortize
        for i in range(reps):
            imgs = ddim1(params, jax.random.PRNGKey(1 + i))
        _drain(imgs)
        ddim_s = (time.perf_counter() - t0) / reps
        print(f"ddim_sample B=1 (50 steps): {ddim_s:.3f} s "
              f"= {1 / ddim_s:.3f} samples/s", file=sys.stderr)
        out["ddim50_b1_sample_s"] = round(ddim_s, 3)
        out["ddim50_b1_samples_per_s"] = round(1 / ddim_s, 3)

    def x_stretch():
        # the 128x128 stretch goal (BASELINE.md:30): same model family,
        # T=1024 at the first attention level -> fused Pallas attention
        cfg128 = UnetConfig(image_size=128)
        tc = TrainConfig(batch_size=B, compute_dtype=args.dtype)
        ms_fn = trainer.make_multi_step(cfg128, tc, diffusion)
        p128 = jax.jit(lambda k: unet.init(k, cfg128))(
            jax.random.PRNGKey(0))
        st = trainer.init_state(jax.tree.map(jnp.array, p128))
        K = 5
        chunks = [jnp.stack([jnp.asarray(rng.standard_normal(
            (B, 128, 128, 3)).astype(np.float32) * 0.5)
            for _ in range(K)]) for _ in range(2)]
        st, losses = ms_fn(st, chunks[0])   # compile
        _drain(losses)
        st, losses = ms_fn(st, chunks[1])   # post-compile warmup
        _drain(losses)
        t0 = time.perf_counter()
        n128 = 8  # 40 timed steps (round-3 VERDICT item 9: 20 was thin)
        for i in range(n128):
            st, losses = ms_fn(st, chunks[i % 2])
        _drain(losses)
        stretch_ms = (time.perf_counter() - t0) / (n128 * K) * 1e3
        print(f"train_step {args.dtype} 128x128: {stretch_ms:.2f} ms",
              file=sys.stderr)
        out["imagenet128_train_step_ms"] = round(stretch_ms, 2)

    if not args.no_verify:
        run_extra("pallas_verify", 60, x_verify)
    if not args.no_f32 and args.dtype == "bfloat16":
        run_extra("f32_3pass", 60, x_f32)
    run_extra("ddpm_b1", 40, x_b1_sampler)
    run_extra("ddim50_b1", 25, x_ddim)
    if not args.no_stretch and args.image_size == 64:
        run_extra("stretch_128", 90, x_stretch)

    if args.secondary and not args.no_secondary:
        def x_secondary():
            other = ("float32" if args.dtype == "bfloat16"
                     else "bfloat16")
            other_ms = bench_step(other)
            print(f"train_step {other}: {other_ms:.2f} ms",
                  file=sys.stderr)

            # input-rotation batches (secondary-only; ~12.6 MB of H2D)
            batches = [jnp.asarray(rng.standard_normal(
                (B, S, S, 3)).astype(np.float32) * 0.5) for _ in range(8)]
            fwd = jax.jit(lambda p, x, t: unet.apply(
                p, cfg, x, t, compute_dtype=jnp.dtype(args.dtype)))
            t = jnp.zeros((B,), jnp.float32)
            r = benchmark(fwd, reps=args.reps,
                          rotate=[(params, b, t) for b in batches])
            print(f"unet_fwd {args.dtype} B={B}: {r['mean_ms']:.2f} ms",
                  file=sys.stderr)

            SB = 32
            sampler = make_sampler(cfg, diffusion, batch_size=SB,
                                   compute_dtype=jnp.dtype(args.dtype))
            imgs = sampler(params, jax.random.PRNGKey(0))  # compile
            _drain(imgs)
            t0 = time.perf_counter()
            imgs = sampler(params, jax.random.PRNGKey(1))
            _drain(imgs)
            dt = time.perf_counter() - t0
            print(f"ddpm_sample B={SB} ({cfg.max_period - 2} steps): "
                  f"{dt:.2f} s = {SB / dt:.3f} samples/s", file=sys.stderr)
        run_extra("secondary", 180, x_secondary)

    emit()  # final (possibly identical) line: last line is always valid


if __name__ == "__main__":
    main()
