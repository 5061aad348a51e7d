"""Hardware timing of the sharded (halo-exchange) posterior gradient at
256^3 with the Pallas slab deposit vs the XLA windowed-scatter slab path.

Runs on however many real devices exist (a 1-device ('grid',) mesh on this
image — the shard_map/ppermute machinery compiles identically, collectives
are self-permutes).  One process, watchdog-wrapped: the axon relay is
single-tenant (CLAUDE.md).

Usage:  timeout 1800 python artifacts/sharded_pallas_hw.py [N [HALO]]
"""
import dataclasses
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
HALO = int(sys.argv[2]) if len(sys.argv) > 2 else 8
BOX = 200.0
REPS = 5

g = GridSpec.cube(N, BOX)
gp = GrowthParams(D1=1.0, D2=-3.0 / 7.0, ascale=1.0, cpecvel=52.85, hubble=100.0)
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
    nobs = jnp.maximum(1.0 + d_eul + jax.random.normal(jax.random.key(1), g.shape), 0.0)
    return truth, nobs, Pk


truth, nobs, Pk = setup()
obs = ObsData(nobs=nobs, window=jnp.ones(g.shape), noise=jnp.ones(g.shape),
              power=Pk)
s0 = truth * 0.5

# dense single-chip reference value (correctness anchor)
from barcode_tpu.model import posterior as post_mod

fc_d = ForwardConfig(sfmodel=3, masskernel="sph_ft", rsd=True, slength=4.0)
mc_d = post_mod.ModelConfig(likelihood=1, forward=fc_d)
psi_dense = jax.jit(lambda d: post_mod.make_psi(g, mc_d, gp, obs)(d)[0])
v_dense = float(psi_dense(s0))
print(json.dumps({"path": "dense", "N": N, "psi": v_dense}), flush=True)

for tag, pallas in [("xla", False), ("pallas", True)]:
    fc = ForwardConfig(sfmodel=3, masskernel="sph_ft", rsd=True, slength=4.0,
                       pallas_deposit=pallas, pallas_halo=HALO)
    psi_sh, grad_sh = sfw.make_sharded_psi(g, fc, gp, likelihood=1, mesh=mesh,
                                           halo=HALO)
    obs_sh = sfw.shard_obs(obs, mesh)
    s_sh = jax.device_put(s0, NamedSharding(mesh, P(sfw.AXIS, None, None)))
    t0 = time.perf_counter()
    gr = grad_sh(s_sh, obs_sh)
    gsum = float(jnp.mean(jnp.abs(gr)))
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPS):
        gr = grad_sh(s_sh, obs_sh)
    float(jnp.sum(gr))
    dt = (time.perf_counter() - t0) / REPS
    val = float(psi_sh(s_sh, obs_sh))
    print(json.dumps({"path": tag, "N": N, "halo": HALO,
                      "grad_ms": round(dt * 1e3, 1),
                      "psi": val, "grad_mean_abs": gsum,
                      "compile_s": round(t_compile, 1)}), flush=True)
