"""Attack the 512^3 relay cap (VERDICT r4 next-step #6).

Round 1 hit HTTP 413 ("length limit exceeded") at jit time for the sharded
512^3 gradient.  The round-5 CPU-side audit (this round) showed the lowered
program itself is tiny (~270 KB StableHLO, zero large constants), so the
likely culprit is a large HOST->DEVICE transfer riding an HTTP request —
e.g. the old probe's host-materialized fields.  This script:

  1. pins the relay's transfer cap by device_put-ing arrays of doubling
     size until failure (records the exact boundary),
  2. runs the 512^3 sharded gradient with ZERO large host transfers —
     every field is created on device inside jits, obs stays device-side,
     device_put only re-shards device arrays,
  3. times it (XLA slab path and, if it compiles, Pallas+tail).

Usage:  timeout 3000 python artifacts/relay_cap_512.py [N]
"""
import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

signal.signal(signal.SIGALRM, lambda *_: (print("WATCHDOG timeout"), os._exit(3)))
signal.alarm(int(os.environ.get("WATCHDOG_S", "2900")))

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

N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
BOX = 400.0
out = {"N": N}

devs = jax.devices()
print(f"# devices: {len(devs)} ({devs[0].platform})", flush=True)

# --- 1. host->device transfer cap -----------------------------------------
cap_mb = None
for mb in (16, 64, 128, 192, 256, 384, 512):
    try:
        t0 = time.time()
        a = jax.device_put(np.ones((mb, 1024, 256), np.float32))  # mb MB
        a.block_until_ready()
        print(f"device_put {mb} MB ok ({time.time()-t0:.1f}s)", flush=True)
        del a
    except Exception as e:  # noqa: BLE001 — record the boundary
        cap_mb = mb
        print(f"device_put {mb} MB FAILED: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
        break
out["transfer_cap_mb"] = cap_mb if cap_mb else f"> {mb}"

# --- 2. 512^3 sharded grad, zero big host transfers ------------------------
g = GridSpec.cube(N, BOX)
gp = GrowthParams(D1=1.0, D2=-3.0 / 7.0, ascale=1.0, cpecvel=52.85,
                  hubble=100.0)
mesh = Mesh(np.asarray(devs), axis_names=(sfw.AXIS,))
xs = NamedSharding(mesh, P(sfw.AXIS, None, None))
fs = NamedSharding(mesh, P(None, sfw.AXIS, None))


def mkpk():
    kk = jnp.sqrt(fourier.k_squared(g))
    keq = 0.02
    return (1e4 * (kk / keq) / (1.0 + (kk / keq) ** 2) ** 1.5).at[0, 0, 0].set(0.0)


# all fields born on device with their final shardings; the truth-free mock
# (uniform nobs) avoids a dense 512^3 lag2eul on one chip
setup = jax.jit(
    lambda: (random_fields.grf(jax.random.key(0), g, mkpk()) * 0.5,
             jnp.ones(g.shape), jnp.ones(g.shape), jnp.ones(g.shape),
             mkpk()),
    out_shardings=(xs, xs, xs, xs, fs))
t0 = time.time()
s0, nobs, win, sig, Pk = setup()
jax.block_until_ready(s0)
print(f"on-device 512^3 setup ok ({time.time()-t0:.1f}s)", flush=True)
obs = ObsData(nobs=nobs, window=win, noise=sig, power=Pk)

for tag, kw, halo in [
        ("xla", dict(pallas_deposit=False), 16),
        ("pallas_tail", dict(pallas_deposit=True, pallas_halo=8,
                             pallas_tail_k=8192), 16)]:
    fc = ForwardConfig(sfmodel=3, masskernel="sph_ft", rsd=True, slength=4.0,
                       **kw)
    try:
        psi_sh, grad_sh = sfw.make_sharded_psi(g, fc, gp, likelihood=1,
                                               mesh=mesh, halo=halo)
        t0 = time.time()
        gr = grad_sh(s0, obs)
        gr.block_until_ready()
        compile_s = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            grad_sh(s0, obs).block_until_ready()
            times.append(time.time() - t0)
        row = {"grad_ms": min(times) * 1e3, "compile_s": compile_s,
               "grad_norm": float(jnp.linalg.norm(gr.ravel())),
               "psi": float(psi_sh(s0, obs))}
        print(tag, json.dumps(row), flush=True)
        out[tag] = row
    except Exception as e:  # noqa: BLE001 — record what blocks 512^3
        msg = f"{type(e).__name__}: {str(e)[:400]}"
        print(tag, "FAILED:", msg, flush=True)
        out[tag] = {"error": msg}

path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    f"relay_cap_{N}.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
print("wrote", path)
