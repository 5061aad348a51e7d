"""Round-4 hardware probe: streamed-window deposit kernel.

Checks, on the real TPU chip:
  1. 128^3 halo 6 block (16,16): stream=True matches stream=False, timing A/B
  2. 256^3 halo 12 block (16,16) streamed: compiles+runs (the config that
     OOMed scoped VMEM with the full window), vs the (8,8) full-window
     fallback, correctness vs the XLA deposit and timing A/B.

Writes artifacts/probe_r4_stream.json.
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
from barcode_tpu import random_fields as rf
from barcode_tpu.forward import assign, lpt, particles
from barcode_tpu.forward import pallas_deposit as pd

OUT = Path(__file__).parent / "probe_r4_stream.json"
results = {}


def make_pos(g):
    @jax.jit
    def mk():
        kk = jnp.sqrt(fourier.k_squared(g))
        keq = 0.02
        P = (1e4 * (kk / keq) / (1.0 + (kk / keq) ** 2) ** 1.5).at[0, 0, 0].set(0.0)
        delta = rf.grf(jax.random.key(0), g, P)
        psi = lpt.zeldovich_psi(delta, g, 1.0)
        return particles.displace(psi, g)
    return mk()


def timeit(fn, *args, n=10):
    r = fn(*args)
    jnp.sum(r).block_until_ready()
    float(jnp.sum(r))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    float(jnp.sum(r))
    return (time.perf_counter() - t0) / n * 1e3


def rel_err(a, b):
    return float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(b)))


def probe(n, halo, block, label):
    g = GridSpec.cube(n, 200.0)
    pos = make_pos(g)
    entry = {}
    ref = jax.jit(lambda p: assign.tsc_deposit(p, g))(pos)

    for stream in (False, True):
        tag = "stream" if stream else "full"
        try:
            f = jax.jit(lambda p: pd.tsc_deposit_pallas(
                p, g, halo=halo, block=block, stream=stream))
            out = f(pos)
            err = rel_err(out, ref)
            ms = timeit(f, pos)
            entry[tag] = {"ok": True, "rel_err": err, "ms": round(ms, 3)}
            print(f"{label} {tag}: err={err:.2e} {ms:.2f} ms", flush=True)
        except Exception as e:
            entry[tag] = {"ok": False, "error": str(e)[:500]}
            print(f"{label} {tag}: FAIL {str(e)[:200]}", flush=True)
    results[label] = entry
    OUT.write_text(json.dumps(results, indent=1))


probe(128, 6, (16, 16), "128_h6_b16")
# 256^3: full-window (16,16) is the config that OOMed; try streamed first
g256 = GridSpec.cube(256, 200.0)
pos256 = make_pos(g256)
ref256 = jax.jit(lambda p: assign.tsc_deposit(p, g256))(pos256)
e = {}
for block, stream, tag in [((16, 16), True, "b16_stream"),
                           ((8, 8), False, "b8_full"),
                           ((8, 8), True, "b8_stream")]:
    try:
        f = jax.jit(lambda p, b=block, s=stream: pd.tsc_deposit_pallas(
            p, g256, halo=12, block=b, stream=s))
        out = f(pos256)
        err = rel_err(out, ref256)
        ms = timeit(f, pos256, n=5)
        e[tag] = {"ok": True, "rel_err": err, "ms": round(ms, 3)}
        print(f"256_h12 {tag}: err={err:.2e} {ms:.2f} ms", flush=True)
    except Exception as ex:
        e[tag] = {"ok": False, "error": str(ex)[:500]}
        print(f"256_h12 {tag}: FAIL {str(ex)[:200]}", flush=True)
results["256_h12"] = e
OUT.write_text(json.dumps(results, indent=1))
print("done")
