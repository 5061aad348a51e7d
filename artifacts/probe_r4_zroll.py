"""Round-4 probe: roll-built z one-hots (Z_ROLL) vs masked passes.

The z one-hot construction is the kernels' largest VPU term (halo-
independent: ~12 masked (N3, TS) passes per gather tile).  Z_ROLL builds
the center one-hot once and derives the +-1 offsets with pltpu.roll on
sublanes (the circular roll also absorbs the periodic wrap arithmetic).
Hardware A/B at the tail-split halos.

Writes probe_r4_zroll.json.  Usage: timeout 3000 python artifacts/probe_r4_zroll.py
"""
import json
import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).parent.parent))

REPS = 15


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
    for n_grid, halo in [(128, 4), (256, 8)]:
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
            return pos

        pos = setup()
        ct = jnp.ones(g.shape) / g.N
        for zroll in (False, True):
            pd.Z_ROLL = zroll
            tag = "roll" if zroll else "mask"
            try:
                dep = jax.jit(lambda p, _h=halo: pd.tsc_deposit_pallas(
                    p, g, halo=_h, block=(16, 16)))
                gat = jax.jit(lambda f, p, _h=halo: pd.tsc_gather_grads_pallas(
                    f, p, g, halo=_h, block=(8, 8), want_value=False))
                results[f"{n_grid}_dep_{tag}_ms"] = round(timeit(dep, pos), 2)
                results[f"{n_grid}_gat_{tag}_ms"] = round(
                    timeit(gat, ct, pos), 2)
            except Exception as e:
                results[f"{n_grid}_{tag}_error"] = str(e)[:200]
            print({k: v for k, v in results.items() if f"{n_grid}" in k},
                  flush=True)
        pd.Z_ROLL = False

    Path(__file__).with_suffix(".json").write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
