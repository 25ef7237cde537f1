"""`.bin` checkpoint interchange (magic 12345678).

Implements the reference's checkpoint contract so CUDA-/torch-written
weights load here and vice versa:
  * 256-int32 header [magic, B, C_in, C_model, C_out, H, W, max_period,
    has_adamw, has_rng] (reference train_unet.cu:4762-4814,
    train_unet.py:768-795).
  * flat fp32 params in torch `named_parameters()` order
    (reference train_unet.py:794, generate.py:17-27).
  * optional AdamW m then v in the same flat order.

Extensions over the reference (backwards compatible — the reference writes
zeros in spare header slots):
  * header[10] stores the optimizer step count, fixing the reference's
    lost-bias-correction-on-resume caveat (train_unet.cu:5019 restarts the
    AdamW step at 1).
  * header[11] stores a 32-bit RNG seed when has_rng=1 is written by us;
    a reference curandState blob (device-specific, has_rng=1 from CUDA) is
    ignored on load.

Layout transforms happen only here: pytree arrays are TPU-native
(HWIO convs, (I,O) linears) and are transposed to/from torch's
OIHW/(O,I)/(O,I,1) shapes at this boundary.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from unet_tpu.config import UnetConfig
from unet_tpu.models import unet

MAGIC = 12345678
HEADER_INTS = 256


def tree_get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def tree_set(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node[k]
    node[path[-1]] = value


def _to_torch(a: np.ndarray, kind: str) -> np.ndarray:
    if kind == "conv":       # (kh, kw, I, O) -> (O, I, kh, kw)
        return a.transpose(3, 2, 0, 1)
    if kind == "linear":     # (I, O) -> (O, I)
        return a.T
    if kind == "conv1d":     # (I, O) -> (O, I, 1)
        return a.T[:, :, None]
    return a                 # "gn": 1-D as-is


def _from_torch(a: np.ndarray, kind: str) -> np.ndarray:
    if kind == "conv":
        return a.transpose(2, 3, 1, 0)
    if kind == "linear":
        return a.T
    if kind == "conv1d":
        return a[:, :, 0].T
    return a


def flatten_params(params, cfg: UnetConfig,
                   num_classes: Optional[int] = None) -> np.ndarray:
    """Pytree -> flat fp32 vector in torch named_parameters() order."""
    chunks = []
    for path, kind in unet.param_order(cfg, num_classes):
        a = np.asarray(tree_get(params, path), dtype=np.float32)
        chunks.append(_to_torch(a, kind).ravel())
    return np.concatenate(chunks)


def param_shape_tree(cfg: UnetConfig, num_classes: Optional[int] = None):
    """Native-layout shapes of every parameter, without computing an init."""
    return jax.eval_shape(
        lambda: unet.init(jax.random.PRNGKey(0), cfg, num_classes))


def unflatten_params(flat: np.ndarray, cfg: UnetConfig,
                     num_classes: Optional[int] = None):
    """Flat torch-order fp32 vector -> native-layout pytree."""
    shapes = param_shape_tree(cfg, num_classes)
    params = _mutable(shapes)  # nested dict/list skeleton, filled below
    offset = 0
    for path, kind in unet.param_order(cfg, num_classes):
        native_shape = tree_get(shapes, path).shape
        torch_shape = _to_torch(np.empty(native_shape, dtype=np.float32),
                                kind).shape
        n = int(np.prod(torch_shape))
        a = flat[offset:offset + n].reshape(torch_shape)
        tree_set(params, path, jnp.asarray(_from_torch(a, kind)))
        offset += n
    if offset != flat.size:
        raise ValueError(
            f"checkpoint has {flat.size} params, model needs {offset}")
    return params


def _mutable(tree):
    if isinstance(tree, dict):
        return {k: _mutable(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_mutable(v) for v in tree]
    return tree


def num_params(cfg: UnetConfig, num_classes: Optional[int] = None) -> int:
    shapes = param_shape_tree(cfg, num_classes)
    return sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))


@dataclasses.dataclass
class Checkpoint:
    params: object
    cfg: UnetConfig
    batch_size: int
    step: int = 0
    adam_m: Optional[object] = None   # pytree, same structure as params
    adam_v: Optional[object] = None
    rng_seed: Optional[int] = None


def save(path: str, ckpt: Checkpoint,
         num_classes: Optional[int] = None) -> None:
    cfg = ckpt.cfg
    header = np.zeros(HEADER_INTS, dtype=np.int32)
    header[0] = MAGIC
    header[1] = ckpt.batch_size
    header[2] = cfg.in_channels
    header[3] = cfg.model_channels
    header[4] = cfg.out_channels
    header[5] = cfg.image_size
    header[6] = cfg.image_size
    header[7] = cfg.max_period
    header[8] = 1 if ckpt.adam_m is not None else 0
    header[9] = 1 if ckpt.rng_seed is not None else 0
    header[10] = ckpt.step
    header[11] = 0 if ckpt.rng_seed is None else ckpt.rng_seed
    with open(path, "wb") as f:
        f.write(header.tobytes())
        f.write(flatten_params(ckpt.params, cfg, num_classes).tobytes())
        if ckpt.adam_m is not None:
            f.write(flatten_params(ckpt.adam_m, cfg, num_classes).tobytes())
            f.write(flatten_params(ckpt.adam_v, cfg, num_classes).tobytes())


def load_torch_pt(path: str, cfg: Optional[UnetConfig] = None,
                  num_classes: Optional[int] = None) -> Checkpoint:
    """Load a torch .pt/.pth state_dict checkpoint (the reference's other
    checkpoint flavor, generate.py:12-16): tensor values are concatenated
    in state_dict order — identical to named_parameters() order for this
    model, and unaffected by torch.compile's `_orig_mod.` key prefix."""
    import torch
    state = torch.load(path, map_location="cpu", weights_only=True)
    if not isinstance(state, dict):
        raise ValueError(f"{path}: expected a state_dict")
    flat = np.concatenate([
        np.asarray(v.detach().float().numpy(), np.float32).ravel()
        for v in state.values() if hasattr(v, "detach")])
    if cfg is None:
        cfg = UnetConfig()
    return Checkpoint(params=unflatten_params(flat, cfg, num_classes),
                      cfg=cfg, batch_size=0)


def load(path: str, cfg: Optional[UnetConfig] = None,
         num_classes: Optional[int] = None) -> Checkpoint:
    """Load a checkpoint: .bin written by us / the reference CUDA trainer /
    `train_unet.py --init_model_only` (reference train_unet.cu:4819-4911),
    or a torch .pt/.pth state_dict (reference generate.py:12-27)."""
    if path.endswith(".pt") or path.endswith(".pth"):
        return load_torch_pt(path, cfg, num_classes)
    with open(path, "rb") as f:
        header = np.frombuffer(f.read(HEADER_INTS * 4), dtype=np.int32)
        if header[0] != MAGIC:
            raise ValueError(f"bad magic {header[0]} in {path}")
        if cfg is None:
            # Architecture constants beyond the header match the reference
            # loader's hardcoded assumptions (train_unet.cu:4848-4864).
            cfg = UnetConfig(
                in_channels=int(header[2]),
                model_channels=int(header[3]),
                out_channels=int(header[4]),
                image_size=int(header[5]),
                max_period=int(header[7]),
            )
        n = num_params(cfg, num_classes)
        params = unflatten_params(
            np.frombuffer(f.read(n * 4), dtype=np.float32), cfg, num_classes)
        adam_m = adam_v = None
        if header[8]:
            adam_m = unflatten_params(
                np.frombuffer(f.read(n * 4), dtype=np.float32), cfg,
                num_classes)
            adam_v = unflatten_params(
                np.frombuffer(f.read(n * 4), dtype=np.float32), cfg,
                num_classes)
        rng_seed = int(header[11]) if header[9] else None
        # Any trailing bytes (reference curandState blob) are ignored.
    return Checkpoint(params=params, cfg=cfg, batch_size=int(header[1]),
                      step=int(header[10]), adam_m=adam_m, adam_v=adam_v,
                      rng_seed=rng_seed)
