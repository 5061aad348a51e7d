"""Round-4 probe: full-window vs streamed deposit at 256^3 under the tail
halo.  The tail split shrank the halo 11 -> 8, putting the (16,16)
full-window working set at ~10.8 MB — just over the 10 MB auto-gate but
plausibly inside the real 16 MB scoped-VMEM limit.  If it compiles and
beats the streamed variant (DMA overhead saved), the gate should loosen.

Writes probe_r4_fullwin.json.  Usage: timeout 2400 python artifacts/probe_r4_fullwin.py
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
    g = GridSpec.cube(256, 200.0)
    fc = ForwardConfig(sfmodel=3, masskernel="sph_ft", rsd=True, slength=4.0)

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
    results = {"working_set_mb": round(pd.deposit_working_set_bytes(
        g, 8, (16, 16)) / 2**20, 2)}
    for stream in (True, False):
        tag = "stream" if stream else "full"
        try:
            dep = jax.jit(lambda p, _s=stream: pd.tsc_deposit_pallas(
                p, g, halo=8, block=(16, 16), stream=_s))
            results[f"dep_{tag}_ms"] = round(timeit(dep, pos), 2)
        except Exception as e:
            results[f"dep_{tag}_error"] = str(e)[:250]
        print(results, flush=True)

    Path(__file__).with_suffix(".json").write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
