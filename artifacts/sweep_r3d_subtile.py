"""Round-3d hardware sweep: gather sub-tile VMEM budget.

At the measured halo 6 the z-first gather's working-set estimate
(4*WXY + 5*N3 rows) lands just above the 6 MB default budget, so
_sub_tile halves TS to 512 (n_sub=2).  A larger budget admits TS=1024
(n_sub=1): same MACs, half the loop iterations and one window visit per
block instead of two.  This times the gather (and the end-to-end force)
at budgets 6/8/11 MB; compile OOMs come back in seconds and are recorded.

Usage: timeout 3000 python artifacts/sweep_r3d_subtile.py
"""
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from barcode_tpu.grid.spec import GridSpec
from barcode_tpu.grid import fourier
from barcode_tpu import random_fields
from barcode_tpu.forward.lag2eul import ForwardConfig, GrowthParams, lag2eul
from barcode_tpu.forward import pallas_deposit as pd

N = 128
K = 20
g = GridSpec.cube(N, 200.0)
gp = GrowthParams(D1=1.0, D2=-3.0 / 7.0, ascale=1.0, cpecvel=52.85, hubble=100.0)
fc = ForwardConfig(sfmodel=3, masskernel="sph_ft", rsd=True, slength=4.0)


@jax.jit
def setup():
    kk = jnp.sqrt(fourier.k_squared(g))
    keq = 0.02
    P = (1e4 * (kk / keq) / (1.0 + (kk / keq) ** 2) ** 1.5).at[0, 0, 0].set(0.0)
    truth = random_fields.grf(jax.random.key(0), g, P)
    _, pos = lag2eul(truth, g, fc, gp, return_pos=True)
    d = jnp.asarray(g.cell, pos.dtype).reshape(3, 1, 1, 1)
    base = jnp.floor(pos / d)
    q = jnp.stack(jnp.meshgrid(jnp.arange(g.N1), jnp.arange(g.N2),
                               jnp.arange(g.N3), indexing="ij")).astype(pos.dtype)
    off = base - q
    L = jnp.asarray([g.N1, g.N2, g.N3], pos.dtype).reshape(3, 1, 1, 1)
    off = jnp.mod(off + L / 2, L) - L / 2
    halo = jnp.max(jnp.abs(off[:2])).astype(jnp.int32) + 2
    cot = random_fields.grf(jax.random.key(3), g, P)
    return pos, cot, halo


pos, cot, halo_dev = setup()
HALO = int(halo_dev)
print(f"measured halo contract: {HALO}", flush=True)

_orig_sub_tile = pd._sub_tile


def time_fn(make):
    @jax.jit
    def loop(pos, x):
        def body(i, acc):
            out = make(x, pos + acc * 1e-30)
            return acc + out.ravel()[0] * 1e-30
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    r = loop(pos, cot)
    float(r)  # compile+warm
    t0 = time.perf_counter()
    float(loop(pos, cot))
    dt = time.perf_counter() - t0
    return dt / K * 1e3


results = {"halo": HALO}
for mb in (6, 8, 11, 13):
    pd._sub_tile = partial(_orig_sub_tile, budget_bytes=mb << 20)
    name = f"gatz_8x8_budget{mb}MB"
    try:
        ms = time_fn(lambda x, p: pd.tsc_gather_grads_pallas(
            x, p, g, halo=HALO, block=(8, 8), want_value=False))
        results[name] = round(ms, 3)
    except Exception as e:  # compile OOM etc.
        results[name] = f"ERROR: {str(e)[:160]}"
    print(name, results[name], flush=True)
pd._sub_tile = _orig_sub_tile

out = Path(__file__).parent / "sweep_r3d_subtile.json"
out.write_text(json.dumps(results, indent=1))
print(json.dumps(results))
