import time, sys, resource, gc
import numpy as np
import jax, jax.numpy as jnp
from unet_tpu.ops import functional as F

def test_stages():
    T=time.time
    xj = jnp.asarray(np.random.randn(4,100).astype(np.float32))
    dout = jnp.asarray(np.random.randn(4,100).astype(np.float32))
    def fake_loss(x):
        return jnp.sum(F.silu(x) * dout)
    print(f"gc counts {gc.get_count()} objects {len(gc.get_objects())}", file=sys.stderr)
    r0 = resource.getrusage(resource.RUSAGE_SELF)
    t0=T()
    lowered = jax.jit(jax.grad(fake_loss, argnums=(0,))).lower(xj)
    r1 = resource.getrusage(resource.RUSAGE_SELF)
    print(f"lower wall {T()-t0:.2f} cpu {r1.ru_utime-r0.ru_utime:.2f} sys {r1.ru_stime-r0.ru_stime:.2f}", file=sys.stderr)
