"""Isolate the Mosaic crash in the streamed deposit (round 4).

Variants at 128^3, halo 6, block (16,16), WX=32:
  V0: 3-D grid, ONE chunk (RS=WX) + accumulate pattern -> tests pl.when /
      revisited output / 3-d grid with Element inputs, WITHOUT the
      two-term sublane offset (s is always 0).
  V1: 4 chunks (RS=8), where-based accumulate (no pl.when).
  V2: 4 chunks (RS=8), pl.when accumulate (the committed variant).
"""
import json
import sys
import time
from functools import partial
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


def run_variant(name, rs, use_when):
    BX, BY = 16, 16
    hx, hy = pd._round_halo(6, BX), 6
    WX, WY = BX + 2 * hx, BY + 2 * hy

    def make_body():
        base = pd._make_kernel(BX, BY, g.N3, WX, WY, stream_rs=rs)
        if use_when:
            return base

        # where-based accumulate clone
        inner = pd._make_kernel(BX, BY, g.N3, WX, WY)  # plain writer

        def body(p_ref, out_ref):
            # recompute acc over rs rows like _make_kernel(stream_rs) but
            # blend with where instead of pl.when
            nxy = BX * BY
            T = WY * g.N3
            TS = pd._sub_tile(T, g.N3 + nxy)
            n_sub = T // TS
            I, J, S = pl.program_id(0), pl.program_id(1), pl.program_id(2)
            x0, y0 = I * BX, J * BY
            x_ids = jax.lax.broadcasted_iota(jnp.int32, (BX, TS), 0)
            y_ids = jax.lax.broadcasted_iota(jnp.int32, (BY, TS), 0)
            z_ids = jax.lax.broadcasted_iota(jnp.int32, (g.N3, TS), 0)

            def tile_acc(r, s, acc):
                sl = slice(s * TS, (s + 1) * TS)
                bx = p_ref[0, r, sl].reshape(TS)
                by = p_ref[1, r, sl].reshape(TS)
                bz = p_ref[2, r, sl].reshape(TS)
                fx = p_ref[3, r, sl].reshape(TS)
                fy = p_ref[4, r, sl].reshape(TS)
                fz = p_ref[5, r, sl].reshape(TS)
                tx = bx.astype(jnp.int32) - x0
                ty = by.astype(jnp.int32) - y0
                tzi = bz.astype(jnp.int32)
                X = jnp.zeros((BX, TS), jnp.float32)
                Y = jnp.zeros((BY, TS), jnp.float32)
                for o in (-1, 0, 1):
                    X = X + jnp.where(x_ids == (tx + o)[None, :],
                                      pd._tsc_w(fx, o)[None, :], 0.0)
                    Y = Y + jnp.where(y_ids == (ty + o)[None, :],
                                      pd._tsc_w(fy, o)[None, :], 0.0)
                AT = (X.reshape(BX, 1, TS) * Y.reshape(1, BY, TS)).reshape(nxy, TS)
                BT = jnp.zeros((g.N3, TS), jnp.float32)
                for oz in (-1, 0, 1):
                    w = pd._tsc_w(fz, oz)
                    t = tzi + oz
                    t = jnp.where(t < 0, t + g.N3,
                                  jnp.where(t >= g.N3, t - g.N3, t))
                    BT = BT + jnp.where(z_ids == t[None, :], w[None, :], 0.0)
                return acc + jax.lax.dot_general(
                    AT, BT, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)

            def row_body(r, acc):
                for s2 in range(n_sub):
                    acc = tile_acc(r, s2, acc)
                return acc

            acc = jax.lax.fori_loop(0, rs, row_body,
                                    jnp.zeros((nxy, g.N3), jnp.float32))
            prev = jnp.where(S == 0, jnp.zeros_like(out_ref[...]), out_ref[...])
            out_ref[...] = prev + acc.reshape(BX, BY, g.N3)

        return body

    part = pd._phase_a(pos, g, hx, hy)
    nc = part.shape[0]
    part = part.reshape(nc, part.shape[1], -1)
    n_chunks = WX // rs
    grid = (g.N1 // BX, g.N2 // BY, n_chunks)
    in_spec = pl.BlockSpec(
        (Element(nc), Element(rs), Element(WY * g.N3)),
        index_map=lambda i, j, s: (0, i * BX + s * rs, j * BY * g.N3))
    out_spec = pl.BlockSpec((BX, BY, g.N3), lambda i, j, s: (i, j, 0))
    try:
        f = jax.jit(lambda p: pl.pallas_call(
            make_body(),
            out_shape=jax.ShapeDtypeStruct(g.shape, jnp.float32),
            grid=grid, in_specs=[in_spec], out_specs=out_spec)(p))
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


run_variant("V0_onechunk_when", rs=32, use_when=True)
run_variant("V1_4chunk_where", rs=8, use_when=False)
run_variant("V2_4chunk_when", rs=8, use_when=True)
print("done")
