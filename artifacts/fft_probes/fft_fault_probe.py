import sys, signal, os
sys.path.insert(0, "/root/repo")
signal.signal(signal.SIGALRM, lambda *_: (print("WD"), os._exit(3)))
signal.alarm(1500)
import jax, jax.numpy as jnp, numpy as np

N = 256
x = np.random.RandomState(0).randn(3, N, N, N).astype(np.float32)
X = np.fft.rfftn(x.astype(np.float64), axes=(-3, -2, -1))
y_ref = np.fft.irfftn(X * 2.0, s=(N, N, N), axes=(-3, -2, -1))

xj = jnp.asarray(x)
def rel(a, b): 
    a=np.asarray(a,np.float64).ravel(); b=np.asarray(b,np.float64).ravel()
    return float(np.linalg.norm(a-b)/np.linalg.norm(b))

# batched rfft+irfft roundtrip (the dense lpt pattern)
f_b = jax.jit(lambda v: jnp.fft.irfftn(jnp.fft.rfftn(v, axes=(-3,-2,-1))*2.0,
                                       s=(N,N,N), axes=(-3,-2,-1)))
# unbatched, vmapped-free single transforms
f_s = jax.jit(lambda v: jnp.stack([
    jnp.fft.irfftn(jnp.fft.rfftn(v[i])*2.0, s=(N,N,N)) for i in range(3)]))
for tag, f in (("batched", f_b), ("per-component", f_s)):
    r1 = rel(f(xj), y_ref)
    r2 = rel(f(xj), y_ref)
    r3 = rel(f(xj), y_ref)
    print(f"{tag}: rel vs f64 = {r1:.3e} {r2:.3e} {r3:.3e}", flush=True)

# forward-only check too (batched rfftn)
F_b = jax.jit(lambda v: jnp.fft.rfftn(v, axes=(-3,-2,-1)).real)(xj)
print("batched rfftn.real rel:", rel(F_b, X.real), flush=True)
