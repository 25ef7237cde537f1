"""The ADM U-Net: static architecture plan + functional init/apply.

Replaces the reference's model-assembly layer — layer counting
(reference train_unet.cu:3447-3487), the arena memory planner
(train_unet.cu:3856-4235) and the hand-rolled forward/backward walks
(train_unet.cu:4237-4701) — with a declarative plan derived from
UnetConfig and a single pure function `apply`.  XLA owns buffer layout and
`jax.grad` owns the backward pass.

The torch module graph it reproduces is reference train_unet.py:252-464
(guided-diffusion UNetModel).
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from unet_tpu.config import UnetConfig
from unet_tpu.models import blocks
from unet_tpu.ops import functional as F
from unet_tpu.ops import s2d as S

# Layer kinds appearing in a plan:
#   ("conv_in", cin, cout)  ("res", cin, cout)  ("attn", c)
#   ("down", c)  ("up", c)
Layer = Tuple


@dataclasses.dataclass(frozen=True)
class UnetPlan:
    input_blocks: Tuple[Tuple[Layer, ...], ...]
    middle: Tuple[Layer, ...]
    output_blocks: Tuple[Tuple[Layer, ...], ...]
    out_channels_pre_head: int


def build_plan(cfg: UnetConfig) -> UnetPlan:
    """Walk the architecture exactly as the torch constructor does
    (reference train_unet.py:323-433): input column pushes one skip per
    block; output column pops them in reverse."""
    ch = cfg.channel_mult[0] * cfg.model_channels
    input_blocks: List[Tuple[Layer, ...]] = [(("conv_in", cfg.in_channels, ch),)]
    skip_chans = [ch]
    ds = 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            layers: List[Layer] = [("res", ch, mult * cfg.model_channels)]
            ch = mult * cfg.model_channels
            if ds in cfg.attention_ds:
                layers.append(("attn", ch))
            input_blocks.append(tuple(layers))
            skip_chans.append(ch)
        if level != len(cfg.channel_mult) - 1:
            input_blocks.append((("down", ch),))
            skip_chans.append(ch)
            ds *= 2

    middle: Tuple[Layer, ...] = (("res", ch, ch), ("attn", ch), ("res", ch, ch))

    output_blocks: List[Tuple[Layer, ...]] = []
    for level, mult in reversed(list(enumerate(cfg.channel_mult))):
        for i in range(cfg.num_res_blocks + 1):
            ich = skip_chans.pop()
            layers = [("res", ch + ich, mult * cfg.model_channels)]
            ch = mult * cfg.model_channels
            if ds in cfg.attention_ds:
                layers.append(("attn", ch))
            if level and i == cfg.num_res_blocks:
                layers.append(("up", ch))
                ds //= 2
            output_blocks.append(tuple(layers))

    return UnetPlan(tuple(input_blocks), middle, tuple(output_blocks), ch)


def fwd_flops(cfg: UnetConfig, batch_size: int = 1) -> int:
    """Analytic forward matmul/conv FLOPs (2·MACs) for one batch.

    Walks the same plan `apply` executes and counts only MXU work (convs,
    linears, attention dots) — the standard model-FLOPs basis for MFU.  A
    training step is 3× this (fwd + input-grad + weight-grad each run the
    same contractions once).  Cross-checked against XLA's own
    cost_analysis in tests/test_model.py::test_fwd_flops_matches_xla.
    """
    plan = build_plan(cfg)

    def conv(h, w, cin, cout, k=3):
        return 2 * h * w * cin * cout * k * k

    def res(h, w, cin, cout):
        f = conv(h, w, cin, cout) + conv(h, w, cout, cout)
        emb_out = 2 * cout if cfg.use_scale_shift_norm else cout
        f += 2 * cfg.time_embed_dim * emb_out
        if cin != cout:
            f += conv(h, w, cin, cout, k=1)
        return f

    def attn(h, w, c):
        t = h * w
        # qkv 1x1 + QK^T + PV + proj 1x1
        return 2 * t * c * 3 * c + 2 * 2 * t * t * c + 2 * t * c * c

    def group(h, w, layers):
        f = 0
        for layer in layers:
            kind = layer[0]
            if kind == "conv_in":
                f += conv(h, w, layer[1], layer[2])
            elif kind == "res":
                f += res(h, w, layer[1], layer[2])
            elif kind == "attn":
                f += attn(h, w, layer[1])
            elif kind == "down":
                h, w = h // 2, w // 2
            elif kind == "up":
                h, w = h * 2, w * 2
        return f, h, w

    s = cfg.image_size
    ted = cfg.time_embed_dim
    total = 2 * (cfg.model_channels * ted + ted * ted)  # time MLP
    h = w = s
    for layers in plan.input_blocks:
        f, h, w = group(h, w, layers)
        total += f
    f, h, w = group(h, w, plan.middle)
    total += f
    for layers in plan.output_blocks:
        f, h, w = group(h, w, layers)
        total += f
    total += conv(s, s, plan.out_channels_pre_head, cfg.out_channels)
    return total * batch_size


# ---------------------------------------------------------------------------
# Init


def _init_layer_group(key, layers, cfg: UnetConfig):
    p = {}
    for layer in layers:
        key, sub = jax.random.split(key)
        kind = layer[0]
        if kind == "conv_in":
            p["conv"] = blocks._conv_init(sub, 3, 3, layer[1], layer[2])
        elif kind == "res":
            p["res"] = blocks.resblock_init(
                sub, layer[1], layer[2], cfg.time_embed_dim,
                scale_shift_norm=cfg.use_scale_shift_norm)
        elif kind == "attn":
            p["attn"] = blocks.attention_init(sub, layer[1])
        # "down"/"up" are parameter-free (AvgPool / nearest-neighbor,
        # reference train_unet.py:38-55).
    return p


def init(key, cfg: UnetConfig, num_classes: Optional[int] = None):
    """Initialize a parameter pytree with torch-default init statistics.

    For bit-exact interop with torch-initialized weights, load a reference
    `unet_init.bin` via unet_tpu.io.checkpoint instead.
    """
    plan = build_plan(cfg)
    k_time, k_in, k_mid, k_out, k_head, k_label = jax.random.split(key, 6)

    tkeys = jax.random.split(k_time, 2)
    params = {
        "time_mlp": {
            "l1": blocks._linear_init(tkeys[0], cfg.model_channels,
                                      cfg.time_embed_dim),
            "l2": blocks._linear_init(tkeys[1], cfg.time_embed_dim,
                                      cfg.time_embed_dim),
        }
    }
    if num_classes is not None:
        # Class-conditional embedding; present-but-unused in the reference
        # (train_unet.py:320-321, class_cond defaults False).
        params["label_emb"] = jax.random.normal(
            k_label, (num_classes, cfg.time_embed_dim), jnp.float32)

    ikeys = jax.random.split(k_in, len(plan.input_blocks))
    params["input"] = [
        _init_layer_group(k, b, cfg) for k, b in zip(ikeys, plan.input_blocks)
    ]

    mkeys = jax.random.split(k_mid, 3)
    ssn = cfg.use_scale_shift_norm
    params["middle"] = {
        "res1": blocks.resblock_init(mkeys[0], *plan.middle[0][1:],
                                     cfg.time_embed_dim,
                                     scale_shift_norm=ssn),
        "attn": blocks.attention_init(mkeys[1], plan.middle[1][1]),
        "res2": blocks.resblock_init(mkeys[2], *plan.middle[2][1:],
                                     cfg.time_embed_dim,
                                     scale_shift_norm=ssn),
    }

    okeys = jax.random.split(k_out, len(plan.output_blocks))
    params["output"] = [
        _init_layer_group(k, b, cfg) for k, b in zip(okeys, plan.output_blocks)
    ]

    params["out"] = {
        "gn": blocks._gn_init(plan.out_channels_pre_head),
        "conv": blocks._conv_init(k_head, 3, 3, plan.out_channels_pre_head,
                                  cfg.out_channels),
    }
    return params


# ---------------------------------------------------------------------------
# Apply


def _apply_layer_group(p, layers, h, emb, cfg: UnetConfig,
                       mode: str = "normal"):
    """mode: "normal" (pixel space), "s2d" (whole group in patch space),
    or "to_s2d" (pixel space, but a trailing "up" layer emits s2d)."""
    in_s2d = mode == "s2d"
    for layer in layers:
        kind = layer[0]
        if kind == "conv_in":
            if in_s2d:
                h = S.conv2d_s2d(h, p["conv"]["w"], p["conv"]["b"],
                                 precision=F._mm_precision(h))
            else:
                h = F.conv2d(h, p["conv"]["w"], p["conv"]["b"])
        elif kind == "res":
            h = blocks.resblock_apply(
                p["res"], h, emb, num_groups=cfg.gn_num_groups,
                eps=cfg.gn_eps,
                scale_shift_norm=cfg.use_scale_shift_norm, s2d=in_s2d)
        elif kind == "attn":
            assert not in_s2d, "attention runs in pixel space only"
            h = blocks.attention_apply(p["attn"], h,
                                       head_size=cfg.num_head_channels,
                                       num_groups=cfg.gn_num_groups,
                                       eps=cfg.gn_eps)
        elif kind == "down":
            # s2d input: the pool window IS the patch (phase mean);
            # output is pixel space either way.
            h = S.avg_pool_2x_from_s2d(h) if in_s2d else F.avg_pool_2x(h)
        elif kind == "up":
            h = (S.upsample_2x_to_s2d(h) if mode == "to_s2d"
                 else F.upsample_nearest_2x(h))
    return h


# Space-to-depth execution of the highest-resolution level (ops/s2d.py).
# MEASURED NEGATIVE RESULT, off by default: packing 2x2 pixel patches
# into channels fills the MXU's 128 output lanes (the C=model_channels
# level-0 convs fill half in pixel space), but (a) the 16/9 FLOP
# inflation caps the effective ceiling at ~110 TF/s — barely above the
# 98 TF/s half-lane bound it replaces — and (b) the per-conv phase
# extraction (4 shifted slices + concat) adds ~18 ms/step of layout
# copies plus ~8 ms of broadcasts at 64 px: 52.1 ms/step vs 16.9
# pixel-space (trace bucket table in docs/PERF.md).  Kept selectable for
# the parity tests and future lane-geometry experiments.
_S2D_MODE = os.environ.get("UNET_TPU_S2D", "off")


def set_s2d_mode(name: str) -> None:
    """Select level-0 execution BEFORE tracing: "off" (default — see the
    measured-negative note above), "on" (patch space wherever supported,
    any backend — used by the CPU parity tests), or "auto" (patch space
    for bf16 on TPU when supported).  Also via UNET_TPU_S2D."""
    global _S2D_MODE
    assert name in ("auto", "on", "off"), name
    _S2D_MODE = name


def s2d_supported(cfg: UnetConfig) -> bool:
    """Patch-space level-0 needs: an even image with a >= 2x2 patch grid,
    a level below it (the down/up boundaries do the space conversion),
    and no attention at ds=1 (attention stays in pixel space)."""
    return (cfg.image_size % 2 == 0 and cfg.image_size // 2 >= 2
            and cfg.num_levels >= 2 and 1 not in cfg.attention_ds)


def _use_s2d(cfg: UnetConfig, compute_dtype) -> bool:
    if _S2D_MODE == "off" or not s2d_supported(cfg):
        return False
    if _S2D_MODE == "on":
        return True
    return (jnp.dtype(compute_dtype) == jnp.bfloat16
            and jax.default_backend() == "tpu")


def apply(params, cfg: UnetConfig, x, t, y=None, *,
          compute_dtype=jnp.float32, remat: bool = False):
    """Full U-Net forward (reference train_unet.py:435-464,
    train_unet.cu:4237-4421).

    x: (B, H, W, C_in) NHWC; t: (B,) timesteps; y: optional (B,) labels.
    Returns (B, H, W, C_out) in compute_dtype.
    """
    plan = build_plan(cfg)
    params = jax.tree.map(lambda a: a.astype(compute_dtype), params)
    x = x.astype(compute_dtype)
    use_s2d = _use_s2d(cfg, compute_dtype)

    # level-0 group indices (patch space when use_s2d)
    nres = cfg.num_res_blocks
    n_out = len(plan.output_blocks)

    def in_mode(i):
        # conv_in + level-0 res blocks + the level-0 "down" group
        return "s2d" if use_s2d and i <= nres + 1 else "normal"

    def out_mode(i):
        if not use_s2d:
            return "normal"
        if i >= n_out - (nres + 1):
            return "s2d"           # level-0 output blocks
        if i == n_out - (nres + 1) - 1:
            return "to_s2d"        # level-1 block whose "up" feeds level 0
        return "normal"

    group = _apply_layer_group
    if remat:
        group = jax.checkpoint(group, static_argnums=(1, 4, 5))

    emb = F.timestep_embedding(t, cfg.model_channels,
                               max_period=cfg.max_period)
    emb = emb.astype(compute_dtype)
    tm = params["time_mlp"]
    emb = F.linear(F.silu(F.linear(emb, tm["l1"]["w"], tm["l1"]["b"])),
                   tm["l2"]["w"], tm["l2"]["b"])
    if y is not None:
        # y = -1 is the NULL label: no class embedding is added, making
        # the forward identical to the unconditional y=None call.  This
        # is the classifier-free-guidance convention (Ho & Salimans
        # 2022): training drops labels to -1 with prob
        # TrainConfig.label_dropout; sampling contrasts y vs -1.  The
        # clamp keeps the gather in-bounds (a traced -1 index is NOT
        # Python-style wraparound under jit).
        lab = params["label_emb"][jnp.maximum(y, 0)]
        emb = emb + jnp.where((y >= 0)[:, None], lab,
                              jnp.zeros((), lab.dtype))

    h = S.space_to_depth(x) if use_s2d else x
    skips = []
    for i, (p, layers) in enumerate(zip(params["input"],
                                        plan.input_blocks)):
        h = group(p, layers, h, emb, cfg, in_mode(i))
        skips.append(h)

    mid = params["middle"]
    h = group({"res": mid["res1"]}, (plan.middle[0],), h, emb, cfg,
              "normal")
    h = group({"attn": mid["attn"]}, (plan.middle[1],), h, emb, cfg,
              "normal")
    h = group({"res": mid["res2"]}, (plan.middle[2],), h, emb, cfg,
              "normal")

    for i, (p, layers) in enumerate(zip(params["output"],
                                        plan.output_blocks)):
        skip = skips.pop()
        if out_mode(i) == "s2d":
            h = S.concat_channels(h, skip)
        else:
            h = jnp.concatenate([h, skip], axis=-1)
        h = group(p, layers, h, emb, cfg, out_mode(i))

    out = params["out"]
    if use_s2d:
        h = S.group_norm_silu_s2d(h, out["gn"]["scale"],
                                  out["gn"]["bias"],
                                  num_groups=cfg.gn_num_groups,
                                  eps=cfg.gn_eps)
        h = S.conv2d_s2d(h, out["conv"]["w"], out["conv"]["b"],
                         precision=F._mm_precision(h))
        return S.depth_to_space(h)
    h = F.group_norm_silu(h, out["gn"]["scale"], out["gn"]["bias"],
                          num_groups=cfg.gn_num_groups, eps=cfg.gn_eps)
    return F.conv2d(h, out["conv"]["w"], out["conv"]["b"])


# ---------------------------------------------------------------------------
# torch named_parameters() flat order (the .bin interchange contract,
# reference train_unet.py:794 / train_unet.cu:4872-4875).

# Each entry: (path-in-pytree, kind) where kind in
# {"gn", "conv", "linear", "conv1d"} selects the torch-shape transform.
ParamRef = Tuple[Tuple, str]


def _res_order(prefix, cin, cout) -> List[ParamRef]:
    refs = [
        (prefix + ("gn1", "scale"), "gn"), (prefix + ("gn1", "bias"), "gn"),
        (prefix + ("conv1", "w"), "conv"), (prefix + ("conv1", "b"), "gn"),
        (prefix + ("emb", "w"), "linear"), (prefix + ("emb", "b"), "gn"),
        (prefix + ("gn2", "scale"), "gn"), (prefix + ("gn2", "bias"), "gn"),
        (prefix + ("conv2", "w"), "conv"), (prefix + ("conv2", "b"), "gn"),
    ]
    if cin != cout:
        refs += [(prefix + ("skip", "w"), "conv"),
                 (prefix + ("skip", "b"), "gn")]
    return refs


def _attn_order(prefix) -> List[ParamRef]:
    return [
        (prefix + ("gn", "scale"), "gn"), (prefix + ("gn", "bias"), "gn"),
        (prefix + ("qkv", "w"), "conv1d"), (prefix + ("qkv", "b"), "gn"),
        (prefix + ("proj", "w"), "conv1d"), (prefix + ("proj", "b"), "gn"),
    ]


def _group_order(prefix, layers) -> List[ParamRef]:
    refs: List[ParamRef] = []
    for layer in layers:
        kind = layer[0]
        if kind == "conv_in":
            refs += [(prefix + ("conv", "w"), "conv"),
                     (prefix + ("conv", "b"), "gn")]
        elif kind == "res":
            refs += _res_order(prefix + ("res",), layer[1], layer[2])
        elif kind == "attn":
            refs += _attn_order(prefix + ("attn",))
    return refs


def param_order(cfg: UnetConfig, num_classes: Optional[int] = None
                ) -> List[ParamRef]:
    """Flat parameter order matching torch model.named_parameters()."""
    plan = build_plan(cfg)
    refs: List[ParamRef] = [
        (("time_mlp", "l1", "w"), "linear"), (("time_mlp", "l1", "b"), "gn"),
        (("time_mlp", "l2", "w"), "linear"), (("time_mlp", "l2", "b"), "gn"),
    ]
    if num_classes is not None:
        refs.append((("label_emb",), "gn"))
    for i, layers in enumerate(plan.input_blocks):
        refs += _group_order(("input", i), layers)
    refs += _res_order(("middle", "res1"), *plan.middle[0][1:])
    refs += _attn_order(("middle", "attn"))
    refs += _res_order(("middle", "res2"), *plan.middle[2][1:])
    for i, layers in enumerate(plan.output_blocks):
        refs += _group_order(("output", i), layers)
    refs += [
        (("out", "gn", "scale"), "gn"), (("out", "gn", "bias"), "gn"),
        (("out", "conv", "w"), "conv"), (("out", "conv", "b"), "gn"),
    ]
    return refs
