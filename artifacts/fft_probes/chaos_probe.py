import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
import sys; sys.path.insert(0, "/root/repo")
import jax.numpy as jnp, numpy as np
from barcode_tpu.grid.spec import GridSpec
from barcode_tpu.grid import fourier
from barcode_tpu import random_fields as rf
from barcode_tpu.forward.lag2eul import ForwardConfig, GrowthParams, lag2eul
from barcode_tpu.model.likelihoods import ObsData
from barcode_tpu.model import posterior

# the sharded_tail_hw problem at 64^3 (same box/N ratio as 256^3/200)
G = GridSpec.cube(64, 50.0)
GP = GrowthParams(D1=1.0, D2=-3.0/7.0, ascale=1.0, cpecvel=52.85, hubble=100.0)
kk = jnp.sqrt(fourier.k_squared(G)); keq = 0.02
Pk = (1e4*(kk/keq)/(1.0+(kk/keq)**2)**1.5).at[0,0,0].set(0.0)
truth = rf.grf(jax.random.key(0), G, Pk)
fc = ForwardConfig(sfmodel=3, masskernel="sph_ft", rsd=True, slength=4.0)
d_eul = lag2eul(truth, G, fc, GP)
nobs = jnp.maximum(1.0+d_eul+jax.random.normal(jax.random.key(1), G.shape), 0.0)
obs = ObsData(nobs=nobs, window=jnp.ones(G.shape), noise=jnp.ones(G.shape), power=Pk)
s = truth*0.5
psi_fn = jax.jit(lambda d: posterior.make_psi(G, posterior.ModelConfig(
    likelihood=1, forward=fc), GP, obs)(d)[0])
v0 = float(psi_fn(s))
# fraction of cells at/near the SC clip (arg <= 0): chaos source
arg = 1.0 + (2.0/3.0)*(-GP.D1*s)
print("collapsed-cell fraction:", float((arg <= 0).mean()))
for eps_rms in (1e-4, 1e-3):
    dv = []
    for k in range(3):
        pert = s + eps_rms*float(jnp.std(s))*jax.random.normal(jax.random.key(10+k), G.shape)
        dv.append(abs(float(psi_fn(pert)) - v0)/abs(v0))
    print(f"input RMS perturbation {eps_rms:g} -> |dpsi|/psi = {np.mean(dv):.3e}")
