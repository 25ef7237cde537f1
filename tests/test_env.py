"""Guard: the suite must run on the 8-device virtual CPU mesh, not the
real TPU (conftest.py forces this; a regression here invalidates every
mesh test)."""

import jax


def test_devices():
    ds = jax.devices()
    assert ds[0].platform == "cpu" and len(ds) == 8, ds
