"""Round-4 probe: is a halo-tail split viable?

Both Pallas kernels pay MACs/VPU work proportional to the x/y window area
(BX+2hx)(BY+2hy), sized by the WORST-CASE displacement (halo 10-12 at 256^3,
6 at 128^3) although typical displacements are much smaller.  A tail split
— run the kernels at a small halo covering ~99.9% of particles, and handle
the rare violators exactly through a compacted XLA scatter/gather — would
cut the window area ~1.6-1.9x at both scales.

Unknowns this probe measures on hardware:
  1. displacement tail: histogram of max(|dx|,|dy|) cell offsets at 128^3
     and 256^3 (violator fraction vs candidate halo);
  2. top_k compaction cost on this backend (lax.sort with payload is
     pathological here — top_k may hit the same wall) + K-row gather/scatter;
  3. kernel time vs halo: deposit/gather standalone at the measured-bound
     halo and at smaller candidate halos (does time actually follow area?).

Writes probe_r4_tail.json.  Usage: timeout 3000 python artifacts/probe_r4_tail.py
"""
import json
import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).parent.parent))

REPS = 10


def timeit(fn, *args, reps=REPS):
    import jax
    out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from barcode_tpu.grid.spec import GridSpec
    from barcode_tpu.grid import fourier
    from barcode_tpu import random_fields
    from barcode_tpu.forward.lag2eul import ForwardConfig, GrowthParams, lag2eul
    from barcode_tpu.forward import pallas_deposit as pd

    gp = GrowthParams(D1=1.0, D2=-3.0 / 7.0, ascale=1.0, cpecvel=52.85,
                      hubble=100.0)
    results = {}

    for n_grid in (128, 256):
        g = GridSpec.cube(n_grid, 200.0)
        fc = ForwardConfig(sfmodel=3, masskernel="sph_ft", rsd=True,
                           slength=4.0)

        @jax.jit
        def setup():
            kk = jnp.sqrt(fourier.k_squared(g))
            keq = 0.02
            P = (1e4 * (kk / keq) / (1.0 + (kk / keq) ** 2) ** 1.5)
            P = P.at[0, 0, 0].set(0.0)
            truth = random_fields.grf(jax.random.key(0), g, P)
            _, pos = lag2eul(truth, g, fc, gp, return_pos=True)
            return truth, pos

        truth, pos = setup()

        # 1. |offset| histogram (x/y axes — the kernel halo contract)
        @jax.jit
        def offs_hist(pos):
            d = jnp.asarray(g.cell, pos.dtype).reshape(3, 1, 1, 1)
            base = jnp.floor(pos / d)
            q = jnp.stack(jnp.meshgrid(
                jnp.arange(g.N1), jnp.arange(g.N2), jnp.arange(g.N3),
                indexing="ij")).astype(pos.dtype)
            off = base - q
            L = jnp.asarray([g.N1, g.N2, g.N3], pos.dtype).reshape(3, 1, 1, 1)
            off = jnp.mod(off + L / 2, L) - L / 2
            m = jnp.maximum(jnp.abs(off[0]), jnp.abs(off[1]))
            return jnp.bincount(m.astype(jnp.int32).ravel(), length=24)

        h = [int(x) for x in offs_hist(pos)]
        total = sum(h)
        # violators for contract |off| <= halo-1, i.e. halo = k+1 covers off<=k
        cum = 0
        tail = {}
        for k in range(len(h) - 1, -1, -1):
            cum += h[k]
            tail[k + 1] = cum / total  # violator fraction at halo = k+1... off >= halo
        results[f"{n_grid}_hist"] = h
        results[f"{n_grid}_viol_frac_by_halo"] = {
            str(halo): tail.get(halo + 1, 0.0) for halo in (3, 4, 5, 6, 8, 10, 12)}
        print(n_grid, "hist:", h, flush=True)
        print(n_grid, "viol by halo:", results[f"{n_grid}_viol_frac_by_halo"],
              flush=True)

        # 2. top_k compaction + K-row gather/scatter
        K = max(g.N // 256, 1024)

        @jax.jit
        def compact(pos):
            d = jnp.asarray(g.cell, pos.dtype).reshape(3, 1, 1, 1)
            base = jnp.floor(pos / d)
            q = jnp.stack(jnp.meshgrid(
                jnp.arange(g.N1), jnp.arange(g.N2), jnp.arange(g.N3),
                indexing="ij")).astype(pos.dtype)
            off = base - q
            L = jnp.asarray([g.N1, g.N2, g.N3], pos.dtype).reshape(3, 1, 1, 1)
            off = jnp.mod(off + L / 2, L) - L / 2
            m = jnp.maximum(jnp.abs(off[0]), jnp.abs(off[1])).ravel()
            vals, idx = jax.lax.top_k(m, K)
            rows = pos.reshape(3, -1)[:, idx]          # K-row gather
            out = jnp.zeros(g.N, jnp.float32).at[idx].add(vals)  # K-row scatter
            return out.sum() + rows.sum()

        results[f"{n_grid}_topk_ms"] = round(timeit(compact, pos), 2)
        print(n_grid, "topk+gather+scatter(K=%d):" % K,
              results[f"{n_grid}_topk_ms"], "ms", flush=True)

        # 3. kernel time vs halo (standalone, measured-bound vs candidates)
        bound = int(max(k for k, c in enumerate(h) if c > 0))
        halos = sorted({bound + 2, 6, 4})
        for halo in halos:
            dep = jax.jit(lambda p, _h=halo: pd.tsc_deposit_pallas(
                p, g, halo=_h, block=(16, 16)))
            ct = jnp.ones(g.shape) / g.N
            gat = jax.jit(lambda f, p, _h=halo: pd.tsc_gather_grads_pallas(
                f, p, g, halo=_h, block=(8, 8), want_value=False))
            results[f"{n_grid}_dep_h{halo}_ms"] = round(timeit(dep, pos), 2)
            results[f"{n_grid}_gat_h{halo}_ms"] = round(timeit(gat, ct, pos), 2)
            print(f"{n_grid} halo={halo}: dep "
                  f"{results[f'{n_grid}_dep_h{halo}_ms']} ms, gat "
                  f"{results[f'{n_grid}_gat_h{halo}_ms']} ms", flush=True)

    Path(__file__).with_suffix(".json").write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
