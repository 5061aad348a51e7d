"""Round-4 sweep C: halo-tail split end-to-end (BENCH_TAIL=1 policy).

The kernels run at the quantile halo (128^3: 4 instead of 6; 256^3: 8
instead of 11) and contract violators (66 / ~1500 particles) go through the
exact compacted XLA path (strided multi-round argmax, not lax.top_k — see
probe_r4_tail.json: top_k alone costs 44 ms at 16.7M rows on this backend).

Writes sweep_r4_tail.json.  Usage: timeout 3000 python artifacts/sweep_r4_tail.py
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
    sps, dt = bench.measure_steps_per_s(n_grid)
    print(f"{tag}: {sps:.3f} steps/s ({dt:.1f}s)", flush=True)
    return {"steps_per_s": round(sps, 3), "dt_s": round(dt, 2)}


def main():
    results = {}
    results["128_tail"] = run(128, "128_tail")
    results["256_tail"] = run(256, "256_tail")
    out = Path(__file__).with_name("sweep_r4_tail.json")
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
