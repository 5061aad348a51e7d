import sys, signal, os
sys.path.insert(0, "/root/repo")
signal.signal(signal.SIGALRM, lambda *_: (print("WD"), os._exit(3)))
signal.alarm(1400)
import jax, jax.numpy as jnp, numpy as np
N = 256
x = np.random.RandomState(0).randn(N, N, N).astype(np.float32)
X64 = np.fft.rfftn(x.astype(np.float64))
def rel(a,b):
    a=np.asarray(a,np.float64).ravel(); b=np.asarray(b,np.float64).ravel()
    return float(np.linalg.norm(a-b)/max(np.linalg.norm(b),1e-30))
xj = jnp.asarray(x)
Fi = jax.jit(lambda v: jnp.fft.rfftn(v).imag)(xj)
Fr = jax.jit(lambda v: jnp.fft.rfftn(v).real)(xj)
print("fused rfftn real rel:", rel(Fr, X64.real), " imag rel:", rel(Fi, X64.imag), flush=True)
# decomposed forward (slab style)
def fwd(v):
    f = jnp.fft.rfft(v, axis=2)
    f = jnp.fft.fft(f, axis=1)
    return jnp.fft.fft(f, axis=0)
Gr = jax.jit(lambda v: fwd(v).real)(xj)
Gi = jax.jit(lambda v: fwd(v).imag)(xj)
print("decomp fwd real rel:", rel(Gr, X64.real), " imag rel:", rel(Gi, X64.imag), flush=True)
# decomposed fwd + decomposed inv roundtrip
def inv(F, n3):
    f = jnp.fft.ifft(F, axis=0)
    f = jnp.fft.ifft(f, axis=1)
    return jnp.fft.irfft(f, n=n3, axis=2)
y_ref = np.fft.irfftn(X64*2.0, s=(N,N,N))
r = jax.jit(lambda v: inv(fwd(v)*2.0, N))(xj)
print("decomp fwd+inv roundtrip rel:", rel(r, y_ref), flush=True)
