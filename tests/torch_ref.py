"""Torch ground-truth executor for parity tests.

Plays the role of the reference's dev/*.py golden-file generators
(reference dev/, SURVEY.md section 4): torch autograd provides fwd/bwd
ground truth.  Instead of a torch nn.Module mirror of the model, this is a
flat interpreter over the same UnetPlan the JAX model uses — it consumes
the torch-ordered flat parameter vector directly (the .bin interchange
layout) and runs NCHW torch.nn.functional ops.  That independently
cross-checks unet_tpu.models.unet.param_order against torch semantics.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as TF

from unet_tpu.config import UnetConfig
from unet_tpu.io import checkpoint as ckpt_io
from unet_tpu.models import unet as junet


def torch_param_list(cfg: UnetConfig, flat: np.ndarray):
    """Split a torch-order flat fp32 vector into torch-shaped leaf tensors
    (requires_grad for autograd parity)."""
    shapes = ckpt_io.param_shape_tree(cfg)
    tensors = []
    offset = 0
    for path, kind in junet.param_order(cfg):
        native = ckpt_io.tree_get(shapes, path).shape
        tshape = ckpt_io._to_torch(np.empty(native, np.float32), kind).shape
        n = int(np.prod(tshape))
        t = torch.tensor(flat[offset:offset + n].reshape(tshape),
                         dtype=torch.float32, requires_grad=True)
        tensors.append(t)
        offset += n
    assert offset == flat.size
    return tensors


class TorchUnet:
    """NCHW torch executor over the UnetPlan."""

    def __init__(self, cfg: UnetConfig, flat: np.ndarray):
        self.cfg = cfg
        self.plan = junet.build_plan(cfg)
        self.params = torch_param_list(cfg, flat)
        self._index = {}
        for i, (path, kind) in enumerate(junet.param_order(cfg)):
            self._index[path] = i

    def p(self, *path):
        return self.params[self._index[path]]

    # -- op helpers (all torch.nn.functional; NCHW) --

    def _gn(self, x, scale, bias):
        return TF.group_norm(x, self.cfg.gn_num_groups, scale, bias,
                             eps=self.cfg.gn_eps)

    def _res(self, prefix, x, emb):
        g = lambda *k: self.p(*(prefix + k))
        h = TF.silu(self._gn(x, g("gn1", "scale"), g("gn1", "bias")))
        h = TF.conv2d(h, g("conv1", "w"), g("conv1", "b"), padding=1)
        e = TF.linear(TF.silu(emb), g("emb", "w"), g("emb", "b"))
        h = h + e[:, :, None, None]
        h = TF.silu(self._gn(h, g("gn2", "scale"), g("gn2", "bias")))
        h = TF.conv2d(h, g("conv2", "w"), g("conv2", "b"), padding=1)
        if (prefix + ("skip", "w")) in self._index:
            x = TF.conv2d(x, g("skip", "w"), g("skip", "b"))
        return x + h

    def _attn(self, prefix, x):
        g = lambda *k: self.p(*(prefix + k))
        B, C, H, W = x.shape
        T = H * W
        HS = self.cfg.num_head_channels
        NH = C // HS
        h = self._gn(x, g("gn", "scale"), g("gn", "bias")).reshape(B, C, T)
        qkv = TF.conv1d(h, g("qkv", "w"), g("qkv", "b"))
        q, k, v = qkv.chunk(3, dim=1)
        q = q.reshape(B * NH, HS, T) / math.sqrt(HS)
        k = k.reshape(B * NH, HS, T)
        v = v.reshape(B * NH, HS, T)
        w = torch.softmax(torch.einsum("bct,bcs->bts", q, k), dim=-1)
        a = torch.einsum("bts,bcs->bct", w, v).reshape(B, C, T)
        a = TF.conv1d(a, g("proj", "w"), g("proj", "b"))
        return x + a.reshape(B, C, H, W)

    def _group(self, prefix, layers, h, emb):
        for layer in layers:
            kind = layer[0]
            if kind == "conv_in":
                h = TF.conv2d(h, self.p(*(prefix + ("conv", "w"))),
                              self.p(*(prefix + ("conv", "b"))), padding=1)
            elif kind == "res":
                h = self._res(prefix + ("res",), h, emb)
            elif kind == "attn":
                h = self._attn(prefix + ("attn",), h)
            elif kind == "down":
                h = TF.avg_pool2d(h, 2)
            elif kind == "up":
                h = TF.interpolate(h, scale_factor=2, mode="nearest")
        return h

    def time_embedding(self, t):
        dt = self.params[0].dtype  # match model precision (f32 or f64)
        half = self.cfg.model_channels // 2
        freqs = torch.exp(-math.log(self.cfg.max_period)
                          * torch.arange(half, dtype=dt) / half)
        args = t.to(dt)[:, None] * freqs[None]
        return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)

    def forward(self, x, t):
        """x: (B, C, H, W) torch fp32; t: (B,) torch."""
        emb = self.time_embedding(t)
        emb = TF.linear(emb, self.p("time_mlp", "l1", "w"),
                        self.p("time_mlp", "l1", "b"))
        emb = TF.linear(TF.silu(emb), self.p("time_mlp", "l2", "w"),
                        self.p("time_mlp", "l2", "b"))
        h = x
        skips = []
        for i, layers in enumerate(self.plan.input_blocks):
            h = self._group(("input", i), layers, h, emb)
            skips.append(h)
        h = self._res(("middle", "res1"), h, emb)
        h = self._attn(("middle", "attn"), h)
        h = self._res(("middle", "res2"), h, emb)
        for i, layers in enumerate(self.plan.output_blocks):
            h = torch.cat([h, skips.pop()], dim=1)
            h = self._group(("output", i), layers, h, emb)
        h = TF.silu(self._gn(h, self.p("out", "gn", "scale"),
                             self.p("out", "gn", "bias")))
        return TF.conv2d(h, self.p("out", "conv", "w"),
                         self.p("out", "conv", "b"), padding=1)

    def grads_flat(self) -> np.ndarray:
        """Concatenated grads in torch order (call after .backward())."""
        return np.concatenate([
            p.grad.detach().numpy().ravel() if p.grad is not None
            else np.zeros(p.numel(), np.float32) for p in self.params])
