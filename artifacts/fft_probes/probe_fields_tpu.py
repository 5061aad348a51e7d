import os, sys, json
sys.path.insert(0, "/root/repo")
import signal
signal.signal(signal.SIGALRM, lambda *_: (print("WD timeout"), os._exit(3)))
signal.alarm(1500)
import jax, jax.numpy as jnp, numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from barcode_tpu.grid.spec import GridSpec
from barcode_tpu.grid import fourier
from barcode_tpu import random_fields
from barcode_tpu.forward import lpt
from barcode_tpu.forward.lag2eul import GrowthParams
from barcode_tpu.parallel import sharded_fft as sf
from barcode_tpu.parallel import sharded_forward as sfw

N = 256
g = GridSpec.cube(N, 200.0)
gp = GrowthParams(D1=1.0, D2=-3.0/7.0, ascale=1.0, cpecvel=52.85, hubble=100.0)
mesh = Mesh(np.asarray(jax.devices()[:1]), axis_names=(sfw.AXIS,))
AXIS = sfw.AXIS

@jax.jit
def setup():
    kk = jnp.sqrt(fourier.k_squared(g)); keq = 0.02
    Pk = (1e4*(kk/keq)/(1.0+(kk/keq)**2)**1.5).at[0,0,0].set(0.0)
    truth = random_fields.grf(jax.random.key(0), g, Pk)
    return truth*0.5

s0 = setup()

@jax.jit
def dense_psi(s):
    return lpt.lpt_psi(s, g, 3, gp.D1, gp.D2, 4.0)

psi_d = dense_psi(s0)

def slab_psi(delta):
    dev = jax.lax.axis_index(AXIS)
    kx, ky, kz = sf.kvec_sharded(g, 1, dev)
    k2 = kx*kx + ky*ky + kz*kz
    guard = k2 > 1e-14
    inv_k2 = jnp.where(guard, 1.0/jnp.where(guard, k2, 1.0), 0.0)
    mx = jnp.where(jnp.arange(g.N1) == g.N1//2, 0.0, 1.0)[:,None,None]
    my = jnp.where(jnp.arange(g.N2) == g.N2//2, 0.0, 1.0)[None,:,None]
    mz = jnp.where(jnp.arange(g.N3//2+1) == g.N3//2, 0.0, 1.0)[None,None,:]
    Fd = sf._rfft3_local(delta, 1, AXIS)
    b2 = Fd*inv_k2
    dd = lambda ka, kb: sf._irfft3_local(ka*kb*b2, 1, g.N3, AXIS)
    pxx, pyy, pzz = dd(kx,kx), dd(ky,ky), dd(kz,kz)
    pxy, pxz, pyz = dd(kx,ky), dd(kx,kz), dd(ky,kz)
    m2v = pxx*pyy - pxy*pxy + pxx*pzz - pxz*pxz + pyy*pzz - pyz*pyz
    div2 = -gp.D1*delta + gp.D2*m2v
    psilin = -gp.D1*delta
    arg = 1.0 + (2.0/3.0)*psilin
    safe = jnp.where(arg > 0.0, arg, 1.0)
    div_sc = jnp.where(arg > 0.0, 3.0*(jnp.sqrt(safe)-1.0), -3.0)
    K = jnp.exp(-k2*(4.0*4.0)/2.0)
    div_C = K*sf._rfft3_local(div2, 1, AXIS) + (1.0-K)*sf._rfft3_local(div_sc, 1, AXIS)
    base = (-1j)*div_C*inv_k2*(mx*my*mz)
    psi = jnp.stack([sf._irfft3_local(base*kx, 1, g.N3, AXIS),
                     sf._irfft3_local(base*ky, 1, g.N3, AXIS),
                     sf._irfft3_local(base*kz, 1, g.N3, AXIS)])
    return 0.5*(psi + sfw._roll_x1(jnp.roll(psi, (1,1), axis=(2,3))))

x_spec = P(AXIS, None, None)
sl = jax.jit(jax.shard_map(slab_psi, mesh=mesh, in_specs=(x_spec,),
                           out_specs=P(None, AXIS, None, None), check_vma=False))
psi_s = sl(jax.device_put(s0, NamedSharding(mesh, x_spec)))
np.savez("/root/repo/artifacts/probe_fields_256.npz",
         s0=np.asarray(s0), psi_d=np.asarray(psi_d), psi_s=np.asarray(psi_s))
print("saved fields; dense||psi||:", float(jnp.linalg.norm(psi_d.ravel())),
      " slab:", float(jnp.linalg.norm(psi_s.ravel())), flush=True)
