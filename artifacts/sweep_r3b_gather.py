"""Round-3b hardware sweep: z-first gather kernel vs xy-first, block shapes.

The z-first formulation (pallas_deposit._make_gather_kernel_zfirst) contracts
the z one-hots on the MXU first (2 dots, contraction dim N3) and folds the
x/y one-hots in on the VPU — 2/3 the MXU MACs of the xy-first kernel, which
per the round-3 profile dominates the VJP.  BY<8 also becomes interesting:
the gather's window area WX*WY (and thus both dot costs) shrinks with BY
because Mosaic's 8-divisibility binds WY = BY + 2*hy.

Usage: timeout 3000 python artifacts/sweep_r3b_gather.py
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


def time_fn(make):
    @jax.jit
    def loop(pos, x):
        def body(i, acc):
            out = make(x, pos + acc * 1e-30)
            return acc + out.ravel()[0] * 1e-30
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    r = loop(pos, cot)
    float(r)
    t0 = time.perf_counter()
    float(loop(pos, cot))
    dt = time.perf_counter() - t0
    return dt / K * 1e3


results = {"halo": HALO}


def run(name, make):
    try:
        ms = time_fn(make)
        results[name] = round(ms, 3)
        print(f"{name}: {ms:.3f} ms", flush=True)
    except Exception as e:
        results[name] = f"ERROR: {e}"[:160]
        print(f"{name}: ERROR {str(e)[:160]}", flush=True)


# gather: zfirst vs old, block shapes, bf16
for BX, BY in [(8, 8), (8, 4), (8, 2), (16, 4), (8, 16)]:
    run(f"gatz_{BX}x{BY}", lambda x, p, BX=BX, BY=BY: pd.tsc_gather_grads_pallas(
        x, p, g, halo=HALO, block=(BX, BY), want_value=False, zfirst=True))
run("gato_8x8", lambda x, p: pd.tsc_gather_grads_pallas(
    x, p, g, halo=HALO, block=(8, 8), want_value=False, zfirst=False))
run("gato_8x4", lambda x, p: pd.tsc_gather_grads_pallas(
    x, p, g, halo=HALO, block=(8, 4), want_value=False, zfirst=False))
run("gatz_8x8_bf16", lambda x, p: pd.tsc_gather_grads_pallas(
    x, p, g, halo=HALO, block=(8, 8), want_value=False, zfirst=True, bf16=True))
run("gatz_8x4_bf16", lambda x, p: pd.tsc_gather_grads_pallas(
    x, p, g, halo=HALO, block=(8, 4), want_value=False, zfirst=True, bf16=True))

# deposit: larger blocks beyond (16,16)
for BX, BY in [(16, 16), (32, 16), (16, 32), (32, 32)]:
    run(f"dep_{BX}x{BY}", lambda x, p, BX=BX, BY=BY: pd.tsc_deposit_pallas(
        p, g, halo=HALO, block=(BX, BY)))

print(json.dumps(results))
Path(__file__).with_suffix(".json").write_text(json.dumps(results, indent=1))
