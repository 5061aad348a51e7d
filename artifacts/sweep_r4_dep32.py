"""Round-4 sweep D: larger deposit blocks under the tail-split halos.

With the quantile halos (4 at 128^3, 8 at 256^3) the (32,32) deposit
block's streamed working set fits the VMEM budget, and window redundancy
(WX*WY)/(BX*BY) drops 4.0 -> 2.25 at 256^3 (1.56 at 128^3) — the deposit's
MAC/VPU work scales with it.  End-to-end A/B against the (16,16) default.

Writes sweep_r4_dep32.json.  Usage: timeout 3000 python artifacts/sweep_r4_dep32.py
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import bench


def run(n_grid, tag, **overrides):
    defaults = dict(PALLAS=True, HALO=0, BLOCK=(8, 8), BLOCK_DEP=None,
                    BF16_GRAD=False, BF16_DEP=False, TAIL=True)
    defaults.update(overrides)
    for k, v in defaults.items():
        setattr(bench, k, v)
    try:
        sps, dt = bench.measure_steps_per_s(n_grid)
    except Exception as e:  # compile-level rejection is a result too
        print(f"{tag}: FAILED {str(e)[:160]}", flush=True)
        return {"error": str(e)[:300]}
    print(f"{tag}: {sps:.3f} steps/s ({dt:.1f}s)", flush=True)
    return {"steps_per_s": round(sps, 3), "dt_s": round(dt, 2)}


def main():
    results = {}
    results["256_dep32"] = run(256, "256_dep32", BLOCK_DEP=(32, 32))
    results["256_dep32x16"] = run(256, "256_dep32x16", BLOCK_DEP=(32, 16))
    results["128_dep32"] = run(128, "128_dep32", BLOCK_DEP=(32, 32))
    out = Path(__file__).with_name("sweep_r4_dep32.json")
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
