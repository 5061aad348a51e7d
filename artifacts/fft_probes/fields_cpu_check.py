import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
import sys; sys.path.insert(0, "/root/repo")
import jax.numpy as jnp, numpy as np
from barcode_tpu.grid.spec import GridSpec
from barcode_tpu.forward import lpt
from barcode_tpu.forward.lag2eul import GrowthParams

d = np.load("/root/repo/artifacts/probe_fields_256.npz")
s0, psi_d, psi_s = d["s0"], d["psi_d"], d["psi_s"]
g = GridSpec.cube(256, 200.0)
gp = GrowthParams(D1=1.0, D2=-3.0/7.0, ascale=1.0, cpecvel=52.85, hubble=100.0)
psi_cpu = np.asarray(jax.jit(lambda s: lpt.lpt_psi(s, g, 3, gp.D1, gp.D2, 4.0))(jnp.asarray(s0)))
def rel(a, b):
    a = np.asarray(a, np.float64).ravel(); b = np.asarray(b, np.float64).ravel()
    return float(np.linalg.norm(a-b)/np.linalg.norm(b))
print("dense_tpu vs cpu:", rel(psi_d, psi_cpu))
print("slab_tpu  vs cpu:", rel(psi_s, psi_cpu))
print("dense_tpu vs slab_tpu:", rel(psi_d, psi_s))
# per-component and per-axis-shift diagnostics on whichever deviates
bad = psi_d if rel(psi_d, psi_cpu) > rel(psi_s, psi_cpu) else psi_s
name = "dense_tpu" if bad is psi_d else "slab_tpu"
print("worse side:", name)
for c in range(3):
    print(f"  comp {c} rel:", rel(bad[c], psi_cpu[c]))
# check for a unit shift in each axis
for ax in range(3):
    for sh in (-1, 1):
        r = rel(np.roll(bad, sh, axis=ax+1), psi_cpu)
        if r < 0.05:
            print(f"  roll axis {ax} shift {sh}: rel {r:.3e}  <-- SHIFT DETECTED")
