import sys, signal, os
sys.path.insert(0, "/root/repo")
signal.signal(signal.SIGALRM, lambda *_: (print("WD"), os._exit(3)))
signal.alarm(1400)
import jax, jax.numpy as jnp, numpy as np
N = 256
x = np.random.RandomState(0).randn(N, N, N).astype(np.float32)
xj = jax.device_put(x)
y = jax.jit(lambda v: v * 2.0)(xj)
d1 = np.asarray(y); d2 = np.asarray(y)
print("elementwise x2 max err:", float(np.abs(d1 - 2*x).max()), flush=True)
print("re-download identical:", bool((d1 == d2).all()), flush=True)
# same-program roundtrip WITHOUT host reference: compare on device
f = jax.jit(lambda v: jnp.abs(jnp.fft.irfftn(jnp.fft.rfftn(v)*2.0, s=(N,N,N)) - 2.0*v).max())
for i in range(3):
    print("on-device roundtrip max|err|:", float(f(xj)), flush=True)
# also relative L2 on device
g2 = jax.jit(lambda v: jnp.linalg.norm((jnp.fft.irfftn(jnp.fft.rfftn(v)*2.0, s=(N,N,N)) - 2.0*v).ravel())
             / jnp.linalg.norm((2.0*v).ravel()))
print("on-device roundtrip rel:", float(g2(xj)), flush=True)
# and at 128 for scale comparison
x1 = jnp.asarray(np.random.RandomState(1).randn(128,128,128).astype(np.float32))
g128 = jax.jit(lambda v: jnp.linalg.norm((jnp.fft.irfftn(jnp.fft.rfftn(v)*2.0, s=(128,)*3) - 2.0*v).ravel())
               / jnp.linalg.norm((2.0*v).ravel()))
print("128 on-device roundtrip rel:", float(g128(x1)), flush=True)
