import sys, signal, os
sys.path.insert(0, "/root/repo")
signal.signal(signal.SIGALRM, lambda *_: (print("WD"), os._exit(3)))
signal.alarm(1400)
import jax, jax.numpy as jnp, numpy as np
N = 256
x = np.random.RandomState(0).randn(N, N, N).astype(np.float32)
xj = jnp.asarray(x)
def rel(a,b):
    a=np.asarray(a,np.float64).ravel(); b=np.asarray(b,np.float64).ravel()
    return float(np.linalg.norm(a-b)/np.linalg.norm(b))

X64 = np.fft.rfftn(x.astype(np.float64))

# minimal failing pair? two-stage chains
p01 = jax.jit(lambda v: jnp.fft.ifft(jnp.fft.ifft(jnp.fft.rfftn(v), axis=0), axis=1).real)
ref01 = np.fft.ifft(np.fft.ifft(X64, axis=0), axis=1).real
print("chain ifft0+ifft1 rel:", rel(p01(xj), ref01), flush=True)
p02 = jax.jit(lambda v: jnp.fft.irfft(jnp.fft.ifft(jnp.fft.rfftn(v), axis=0), n=N, axis=2))
ref02 = np.fft.irfft(np.fft.ifft(X64, axis=0), n=N, axis=2)
print("chain ifft0+irfft2 rel:", rel(p02(xj), ref02), flush=True)

# with optimization_barrier between stages (full inverse)
def inv_b(X):
    f = jnp.fft.ifft(X, axis=-3)
    f = jax.lax.optimization_barrier(f)
    f = jnp.fft.ifft(f, axis=-2)
    f = jax.lax.optimization_barrier(f)
    return jnp.fft.irfft(f, n=N, axis=-1)
rt_b = jax.jit(lambda v: inv_b(jnp.fft.rfftn(v)*2.0))
for i in range(3):
    print("barrier decomp roundtrip rel:", rel(rt_b(xj), 2.0*x), flush=True)
