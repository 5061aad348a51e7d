"""Round-4 streamed deposit, take 3: no revisiting — each window-row chunk
writes its own partial grid (out block indexed by s), summed outside the
kernel.  Tests whether (a) 3-d grid + Element input + s-varying out works,
and (b) the two-term sublane Element offset i*BX + s*RS compiles.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax._src.pallas.core import Element

from barcode_tpu.grid.spec import GridSpec
from barcode_tpu.grid import fourier
from barcode_tpu import random_fields as rf
from barcode_tpu.forward import assign, lpt, particles
from barcode_tpu.forward import pallas_deposit as pd

g = GridSpec.cube(128, 200.0)


@jax.jit
def mk():
    kk = jnp.sqrt(fourier.k_squared(g))
    keq = 0.02
    P = (1e4 * (kk / keq) / (1.0 + (kk / keq) ** 2) ** 1.5).at[0, 0, 0].set(0.0)
    delta = rf.grf(jax.random.key(0), g, P)
    psi = lpt.zeldovich_psi(delta, g, 1.0)
    return particles.displace(psi, g)


pos = mk()
ref = jax.jit(lambda p: assign.tsc_deposit(p, g))(pos)


def run_variant(name, rs):
    BX, BY = 16, 16
    hx, hy = pd._round_halo(6, BX), 6
    WX, WY = BX + 2 * hx, BY + 2 * hy
    n_chunks = WX // rs

    # plain writer body over rs rows, one partial per chunk; out block has a
    # leading chunk dim of 1, so hand the body a squeezed ref view
    inner = pd._make_kernel(BX, BY, g.N3, rs, WY)

    def body(p_ref, out_ref):
        inner(p_ref, out_ref.at[0])

    part = pd._phase_a(pos, g, hx, hy)
    nc = part.shape[0]
    part = part.reshape(nc, part.shape[1], -1)
    grid = (n_chunks, g.N1 // BX, g.N2 // BY)
    in_spec = pl.BlockSpec(
        (Element(nc), Element(rs), Element(WY * g.N3)),
        index_map=lambda s, i, j: (0, i * BX + s * rs, j * BY * g.N3))
    out_spec = pl.BlockSpec((1, BX, BY, g.N3), lambda s, i, j: (s, i, j, 0))
    try:
        def full(p):
            parts = pl.pallas_call(
                body,
                out_shape=jax.ShapeDtypeStruct((n_chunks,) + g.shape,
                                               jnp.float32),
                grid=grid, in_specs=[in_spec], out_specs=out_spec)(p)
            return jnp.sum(parts, axis=0)

        f = jax.jit(full)
        out = f(part)
        err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
        t0 = time.perf_counter()
        for _ in range(10):
            out = f(part)
        float(jnp.sum(out))
        ms = (time.perf_counter() - t0) / 10 * 1e3
        print(f"{name}: OK err={err:.2e} {ms:.2f} ms", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:300]}", flush=True)


run_variant("V3_partial_out_4chunk_rs8", rs=8)
run_variant("V3b_partial_out_2chunk_rs16", rs=16)
print("done")
