"""Round-2 hardware sweep: bf16 MXU dots + output-block tuning at 128^3.

One process, sequential configs (the axon relay is single-tenant).  Each
config times the full leapfrog attempt (bench.build_step) — end-to-end
steps/s is the decision metric, not isolated kernel time.

Usage: timeout 3000 python artifacts/sweep_r2_kernels.py
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
import bench

CONFIGS = [
    dict(name="f32_b8x8", BF16_GRAD=False, BF16_DEP=False, BLOCK=(8, 8)),
    dict(name="bf16g_b8x8", BF16_GRAD=True, BF16_DEP=False, BLOCK=(8, 8)),
    dict(name="bf16gd_b8x8", BF16_GRAD=True, BF16_DEP=True, BLOCK=(8, 8)),
    dict(name="f32_b16x8", BF16_GRAD=False, BF16_DEP=False, BLOCK=(16, 8)),
    dict(name="bf16g_b16x8", BF16_GRAD=True, BF16_DEP=False, BLOCK=(16, 8)),
    dict(name="bf16gd_b16x8", BF16_GRAD=True, BF16_DEP=True, BLOCK=(16, 8)),
]

results = {}
for c in CONFIGS:
    bench.BF16_GRAD = c["BF16_GRAD"]
    bench.BF16_DEP = c["BF16_DEP"]
    bench.BLOCK = c["BLOCK"]
    t0 = time.perf_counter()
    try:
        sps, dt = bench.measure_steps_per_s(bench.N_GRID)
        results[c["name"]] = round(sps, 2)
        print(f"{c['name']}: {sps:.2f} steps/s (timed {dt:.2f}s, "
              f"total incl compile {time.perf_counter()-t0:.0f}s)", flush=True)
    except Exception as e:
        results[c["name"]] = f"ERROR: {e}"[:200]
        print(f"{c['name']}: ERROR {e}", flush=True)

print(json.dumps(results))
Path(__file__).with_suffix(".json").write_text(json.dumps(results, indent=1))
