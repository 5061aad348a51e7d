"""Round-3c hardware timing: arithmetic distance-grid weight construction
(_tsc_w_s) vs the r3b numbers for the masked one-hot construction
(sweep_r3b_gather.json: gatz_8x8 5.464, dep_16x16 4.688, halo 6).

Usage: timeout 1800 python artifacts/sweep_r3c_arith.py
"""
import json
import sys
import time
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
    cot = random_fields.grf(jax.random.key(3), g, P)
    return pos, cot


pos, cot = setup()
HALO = 6


def time_fn(make):
    @jax.jit
    def loop(pos, x):
        def body(i, acc):
            out = make(x, pos + acc * 1e-30)
            return acc + out.ravel()[0] * 1e-30
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    float(loop(pos, cot))
    t0 = time.perf_counter()
    float(loop(pos, cot))
    return (time.perf_counter() - t0) / K * 1e3


results = {"halo": HALO}
for name, make in [
    ("gatz_8x8_arith", lambda x, p: pd.tsc_gather_grads_pallas(
        x, p, g, halo=HALO, block=(8, 8), want_value=False)),
    ("dep_16x16_arith", lambda x, p: pd.tsc_deposit_pallas(
        p, g, halo=HALO, block=(16, 16))),
    ("dep_8x8_arith", lambda x, p: pd.tsc_deposit_pallas(
        p, g, halo=HALO, block=(8, 8))),
    ("dep_16x16_arith_weighted", lambda x, p: pd.tsc_deposit_pallas(
        p, g, halo=HALO, block=(16, 16), weights=x)),
]:
    try:
        ms = time_fn(make)
        results[name] = round(ms, 3)
        print(f"{name}: {ms:.3f} ms", flush=True)
    except Exception as e:
        results[name] = f"ERROR: {e}"[:160]
        print(f"{name}: ERROR {str(e)[:160]}", flush=True)

print(json.dumps(results))
Path(__file__).with_suffix(".json").write_text(json.dumps(results, indent=1))
