"""Hardware timing of the sharded posterior gradient with the round-5 slab
halo-tail split (VERDICT r4 next-step #2): kernels at the quantile halo,
worst-case ppermute exchange margin, exact 27-point XLA tail.

Compares three configs at N^3 on the real device mesh:
  xla            — XLA windowed-scatter slab path (baseline)
  pallas         — slab Pallas kernels at the worst-case halo (round-4 state)
  pallas+tail    — slab Pallas kernels at the quantile halo + exact tail

Usage:  timeout 1800 python artifacts/sharded_tail_hw.py [N [H_BOUND [H_QUANT]]]
Round-4 reference numbers at 256^3 (PLAN.md): pallas 248 ms, xla 2992 ms.
"""
import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

signal.signal(signal.SIGALRM, lambda *_: (print("WATCHDOG timeout"), os._exit(3)))
signal.alarm(int(os.environ.get("WATCHDOG_S", "1700")))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from barcode_tpu.grid.spec import GridSpec
from barcode_tpu.grid import fourier
from barcode_tpu import random_fields
from barcode_tpu.forward.lag2eul import ForwardConfig, GrowthParams, lag2eul
from barcode_tpu.model.likelihoods import ObsData
from barcode_tpu.parallel import sharded_forward as sfw

N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
H_BOUND = int(sys.argv[2]) if len(sys.argv) > 2 else 12   # worst-case margin
H_QUANT = int(sys.argv[3]) if len(sys.argv) > 3 else 8    # quantile kernel halo
TAIL_K = 4096
BOX = 200.0
REPS = 5

g = GridSpec.cube(N, BOX)
gp = GrowthParams(D1=1.0, D2=-3.0 / 7.0, ascale=1.0, cpecvel=52.85,
                  hubble=100.0)
devs = jax.devices()
print(f"# devices: {len(devs)} ({devs[0].platform})", flush=True)
mesh = Mesh(np.asarray(devs), axis_names=(sfw.AXIS,))


@jax.jit
def setup():
    kk = jnp.sqrt(fourier.k_squared(g))
    keq = 0.02
    Pk = (1e4 * (kk / keq) / (1.0 + (kk / keq) ** 2) ** 1.5).at[0, 0, 0].set(0.0)
    truth = random_fields.grf(jax.random.key(0), g, Pk)
    fc0 = ForwardConfig(sfmodel=3, masskernel="sph_ft", rsd=True, slength=4.0)
    d_eul = lag2eul(truth, g, fc0, gp)
    nobs = jnp.maximum(1.0 + d_eul
                       + jax.random.normal(jax.random.key(1), g.shape), 0.0)
    return truth, nobs, Pk


truth, nobs, Pk = setup()
obs = ObsData(nobs=nobs, window=jnp.ones(g.shape), noise=jnp.ones(g.shape),
              power=Pk)
s0 = truth * 0.5

from barcode_tpu.model import posterior as post_mod

fc_d = ForwardConfig(sfmodel=3, masskernel="sph_ft", rsd=True, slength=4.0)
mc_d = post_mod.ModelConfig(likelihood=1, forward=fc_d)
psi_dense = jax.jit(lambda d: post_mod.make_psi(g, mc_d, gp, obs)(d)[0])
v_dense = float(psi_dense(s0))
print(json.dumps({"path": "dense", "N": N, "psi": v_dense}), flush=True)

results = {"N": N, "h_bound": H_BOUND, "h_quant": H_QUANT, "tail_k": TAIL_K,
           "psi_dense": v_dense}
configs = [
    ("pallas_tail", dict(pallas_deposit=True, pallas_halo=H_QUANT,
                         pallas_tail_k=TAIL_K), H_BOUND),
    ("pallas", dict(pallas_deposit=True, pallas_halo=H_BOUND,
                    pallas_tail_k=0), H_BOUND),
    ("xla", dict(pallas_deposit=False), H_BOUND),
]
for tag, kw, halo in configs:
    fc = ForwardConfig(sfmodel=3, masskernel="sph_ft", rsd=True, slength=4.0,
                       **kw)
    psi_sh, grad_sh = sfw.make_sharded_psi(g, fc, gp, likelihood=1, mesh=mesh,
                                           halo=halo)
    obs_sh = sfw.shard_obs(obs, mesh)
    s_sh = jax.device_put(s0, NamedSharding(mesh, P(sfw.AXIS, None, None)))
    t0 = time.perf_counter()
    gr = grad_sh(s_sh, obs_sh)
    gr.block_until_ready()
    compile_s = time.perf_counter() - t0
    v_sh = float(psi_sh(s_sh, obs_sh))
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        grad_sh(s_sh, obs_sh).block_until_ready()
        times.append(time.perf_counter() - t0)
    g_norm = float(jnp.linalg.norm(gr.ravel()))
    row = {"path": tag, "grad_ms": min(times) * 1e3,
           "times_ms": [t * 1e3 for t in times], "psi": v_sh,
           "psi_rel_err_vs_dense": abs(v_sh - v_dense) / abs(v_dense),
           "grad_norm": g_norm, "compile_s": compile_s}
    results[tag] = row
    print(json.dumps(row), flush=True)
    # write incrementally: cold compiles can exhaust the outer timeout
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"sharded_tail_hw_{N}.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)

print("wrote", out)
