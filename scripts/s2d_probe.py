"""Microbench via serialized scan chains (sound on the tunneled TPU):
level-0 conv vs its space-to-depth dense equivalent."""
import numpy as np, jax, jax.numpy as jnp
from unet_tpu.utils.benchmark import benchmark

B, N = 32, 50
r = np.random.default_rng(0)

def chain(fn, x, w):
    def body(c, _):
        return fn(c, w), ()
    y, _ = jax.lax.scan(body, x, None, length=N)
    return y

def conv_same(x, w):
    return jax.lax.conv_general_dilated(x, w, (1,1), "SAME",
        dimension_numbers=("NHWC","HWIO","NHWC"))

def conv_s2d(x, w):
    y = jax.lax.conv_general_dilated(x, w, (1,1), [(1,0),(1,0)],
        dimension_numbers=("NHWC","HWIO","NHWC"))
    return y

cases = {
  "orig 64x64x64->64 3x3 SAME": ((B,64,64,64), (3,3,64,64), conv_same),
  "s2d  32x32x256->256 2x2 pad(1,0)": ((B,32,32,256), (2,2,256,256), conv_s2d),
  "orig128 128x128x64->64 3x3": ((B,128,128,64), (3,3,64,64), conv_same),
  "s2d128 64x64x256->256 2x2": ((B,64,64,256), (2,2,256,256), conv_s2d),
}
for name, (xs, ws, fn) in cases.items():
    x = jnp.asarray((r.standard_normal(xs)*0.1).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray((r.standard_normal(ws)*0.02).astype(np.float32)).astype(jnp.bfloat16)
    f = jax.jit(lambda x, w, fn=fn: chain(fn, x, w))
    res = benchmark(f, x, w, reps=6, chunks=2)
    ms = res['mean_ms'] / N
    flops = 2.0 * np.prod(xs[:3]) * ws[3] * ws[0]*ws[1]*ws[2]
    print(f"{name}: {ms:.3f} ms/conv, {flops/ms/1e-3/1e12:.1f} TF/s", flush=True)
