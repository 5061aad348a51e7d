"""Round-3 hardware sweep: per-kernel block-shape tuning at 128^3.

Round 2's sweep timed end-to-end steps/s with ONE block knob shared by the
deposit and the gather; the MAC analysis says the two kernels want different
shapes (per real particle, both cost ~ WX*WY*N3 MXU MACs, but the deposit's
VPU one-hot construction scales with the window *redundancy* WX*WY/(BX*BY)
while the gather's does not — so the gather should prefer the smallest legal
block and the deposit something mid-sized).  This sweep times each kernel in
isolation (K reps inside one jit; input perturbed by the carry to defeat
CSE) so the knobs can be set independently.

Usage: timeout 3000 python artifacts/sweep_r3_kernels.py
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
    """make(x, pos) -> scalar-ish output; K reps inside one jit."""

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
    return dt / K * 1e3  # ms per call


results = {"halo": HALO}

for BX, BY in [(8, 8), (16, 8), (8, 16), (16, 16), (4, 8), (8, 4), (4, 4),
               (32, 8), (8, 32)]:
    name = f"dep_{BX}x{BY}"
    try:
        ms = time_fn(lambda x, p, BX=BX, BY=BY: pd.tsc_deposit_pallas(
            p, g, halo=HALO, block=(BX, BY)))
        results[name] = round(ms, 3)
        print(f"{name}: {ms:.3f} ms", flush=True)
    except Exception as e:
        results[name] = f"ERROR: {e}"[:160]
        print(f"{name}: ERROR {str(e)[:160]}", flush=True)

for BX, BY in [(8, 8), (4, 8), (8, 4), (4, 4), (16, 8), (8, 16), (16, 16),
               (2, 8), (8, 2)]:
    name = f"gat_{BX}x{BY}"
    try:
        ms = time_fn(lambda x, p, BX=BX, BY=BY: pd.tsc_gather_grads_pallas(
            x, p, g, halo=HALO, block=(BX, BY), want_value=False))
        results[name] = round(ms, 3)
        print(f"{name}: {ms:.3f} ms", flush=True)
    except Exception as e:
        results[name] = f"ERROR: {e}"[:160]
        print(f"{name}: ERROR {str(e)[:160]}", flush=True)

print(json.dumps(results))
Path(__file__).with_suffix(".json").write_text(json.dumps(results, indent=1))
