"""Interchange proof against the REAL reference implementation.

Every other parity test in this suite validates against tests/torch_ref.py,
a torch executor derived from our own `unet.param_order` — it would not
catch a systematic param-ordering bug (both sides would consume the flat
vector in the same wrong order and agree).  These tests close that gap by
importing the reference's actual code from /root/reference:

  * `UNetModel` + `save_model_params_to_bin` (train_unet.py:281-464,
    768-795) write a .bin and a .pt that our loader must consume with
    forward-output parity against `UNetModel.forward`;
  * our `save()` output must load into the reference model through the
    exact loader walk `generate.py:17-27` uses, with matching outputs.

This is the README's bidirectional interchange claim, tested against
artifacts the reference code itself produced.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
ref = pytest.importorskip("train_unet")  # the reference's own module

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from unet_tpu.config import UnetConfig  # noqa: E402
from unet_tpu.io import checkpoint as ckpt_io  # noqa: E402
from unet_tpu.models import unet  # noqa: E402

# The production model of generate.py:64 / create_model
# (train_unet.py:731-763): ADM U-Net, C_model=64, attention ds (4, 8).
CFG = UnetConfig()
B = 2


@pytest.fixture(scope="module")
def ref_model():
    torch.manual_seed(0)
    model = ref.UNetModel(3, 64, 3, 2, (4, 8), num_head_channels=32)
    model.eval()
    return model


@pytest.fixture(scope="module")
def sample_input():
    rng = np.random.default_rng(7)
    x = rng.standard_normal((B, 3, 64, 64)).astype(np.float32) * 0.5
    t = rng.integers(0, 1000, size=(B,)).astype(np.float32)
    return x, t


def ref_forward(model, x, t):
    # The reference's timestep calling convention is shape (B, 1)
    # (dev/unet_test.py:298 `view(B, 1)`); its timestep_embedding
    # broadcasts (B,1)*(1,half) -> (B,half) (train_unet.py:481).
    with torch.no_grad():
        out = model(torch.from_numpy(x), torch.from_numpy(t).view(-1, 1))
    return out.numpy()


_jit_apply = jax.jit(lambda p, xx, tt: unet.apply(p, CFG, xx, tt))


def our_forward(params, x, t):
    out = _jit_apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                     jnp.asarray(t))
    return np.asarray(out).transpose(0, 3, 1, 2)


def assert_close(a, b, tol, what):
    # the reference's dev/common.h:57-86 validate_result, same role here
    from unet_tpu.utils.benchmark import validate_result
    validate_result(a, b, name=what, atol=tol)


def test_reference_bin_loads_here(ref_model, sample_input, tmp_path):
    """reference save_model_params_to_bin -> our load -> forward parity."""
    path = str(tmp_path / "ref_init.bin")
    ref.save_model_params_to_bin(ref_model, path)
    ckpt = ckpt_io.load(path)
    x, t = sample_input
    assert_close(our_forward(ckpt.params, x, t), ref_forward(ref_model, x, t),
                 1e-3, "ref .bin -> unet_tpu forward")


def test_reference_pt_loads_here(ref_model, sample_input, tmp_path):
    """reference state_dict .pt -> our (shape-verified) load -> parity."""
    path = str(tmp_path / "ref_model.pt")
    torch.save(ref_model.state_dict(), path)
    ckpt = ckpt_io.load(path)
    x, t = sample_input
    assert_close(our_forward(ckpt.params, x, t), ref_forward(ref_model, x, t),
                 1e-3, "ref .pt -> unet_tpu forward")


def test_our_bin_loads_into_reference(ref_model, sample_input, tmp_path):
    """our save -> the reference's generate.py:17-27 loader walk -> parity.

    Uses a FRESH jax-side init (not the reference weights round-tripped)
    so the test proves our writer's ordering, not a copy."""
    params = jax.jit(lambda k: unet.init(k, CFG))(jax.random.PRNGKey(3))
    path = str(tmp_path / "ours.bin")
    ckpt_io.save(path, ckpt_io.Checkpoint(params=params, cfg=CFG,
                                          batch_size=B))

    # generate.py:17-27, verbatim semantics: named_parameters walk
    with open(path, "rb") as f:
        header = np.frombuffer(f.read(256 * 4), dtype=np.int32)
        weights_np = np.frombuffer(f.read(), dtype=np.float32).copy()
    assert header[0] == 12345678
    # our extension blob must not confuse the reference's "rest of file is
    # params" read: header[8]=has_adamw=0, header[9]=has_rng=0 here, and
    # the param count must consume the whole payload
    offset = 0
    for _, param in ref_model.named_parameters():
        n = param.numel()
        param.data = torch.from_numpy(
            weights_np[offset:offset + n]).view_as(param)
        offset += n
    assert offset == weights_np.size, "trailing bytes after params"

    x, t = sample_input
    assert_close(our_forward(params, x, t), ref_forward(ref_model, x, t),
                 1e-3, "unet_tpu .bin -> reference forward")


def test_param_count_matches_reference(ref_model):
    n_ref = sum(p.numel() for p in ref_model.parameters())
    assert ckpt_io.num_params(CFG) == n_ref


def test_pt_with_reordered_keys_fails_loudly(ref_model, tmp_path):
    """The .pt loader verifies shape-sequence against param_order instead
    of trusting dict order (io/checkpoint.py load_torch_pt)."""
    state = ref_model.state_dict()
    items = list(state.items())
    # swap two tensors with different shapes
    reordered = dict([items[1], items[0]] + items[2:])
    path = str(tmp_path / "reordered.pt")
    torch.save(reordered, path)
    with pytest.raises(ValueError, match="order"):
        ckpt_io.load(path)
