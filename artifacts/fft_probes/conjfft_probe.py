import sys, signal, os
sys.path.insert(0, "/root/repo")
signal.signal(signal.SIGALRM, lambda *_: (print("WD"), os._exit(3)))
signal.alarm(1400)
import jax, jax.numpy as jnp, numpy as np
N = 256
x = np.random.RandomState(0).randn(N, N, N).astype(np.float32)
xj = jnp.asarray(x)

def inv_via_fwd(X, n3):
    # ifftn = conj(fftn(conj(X)))/N over the two complex axes, then the
    # real axis via Hermitian expansion + 1-D inverse built the same way
    f = jnp.conj(jnp.fft.fft(jnp.conj(X), axis=0)) / X.shape[0]
    f = jnp.conj(jnp.fft.fft(jnp.conj(f), axis=1)) / X.shape[1]
    # expand half-complex z to full and do complex ifft via conj-fwd
    n3h = f.shape[2]
    tail = jnp.conj(f[:, :, 1:n3 - n3h + 1][:, :, ::-1])
    # careful with wrap of x/y frequency: full Hermitian mirror needs
    # index negation on axes 0 and 1 for the tail
    tail = jnp.roll(tail[::-1, ::-1], (1, 1), axis=(0, 1))
    full = jnp.concatenate([f, tail], axis=2)
    out = jnp.conj(jnp.fft.fft(jnp.conj(full), axis=2)) / n3
    return out.real

f_rt = jax.jit(lambda v: inv_via_fwd(jnp.fft.rfftn(v) * 2.0, N))
def rel(a, b):
    a=np.asarray(a,np.float64).ravel(); b=np.asarray(b,np.float64).ravel()
    return float(np.linalg.norm(a-b)/np.linalg.norm(b))
for i in range(3):
    print("conj-fwd inverse roundtrip rel:", rel(f_rt(xj), 2.0*x), flush=True)

# per-stage: is plain complex fft along each axis exact at 256^3 shapes?
X0 = np.fft.rfftn(x.astype(np.float64))
g1 = jax.jit(lambda v: jnp.fft.ifft(jnp.fft.rfftn(v), axis=0).real)
ref1 = np.fft.ifft(X0, axis=0).real
print("ifft axis0 alone rel:", rel(g1(xj), ref1), flush=True)
g2 = jax.jit(lambda v: jnp.fft.irfft(jnp.fft.rfftn(v), n=N, axis=2))
ref2 = np.fft.irfft(X0, n=N, axis=2)
print("irfft axis2 alone rel:", rel(g2(xj), ref2), flush=True)
