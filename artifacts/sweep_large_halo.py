"""Block-size sweep at large halo (realistic WMAP7-scale displacements
resolve halo ~17-20 at 128^3; window overlap scales as ((B+2h)/B)^2, so
larger blocks should win there even though (8,8) wins at halo 8).

Usage: timeout 3000 python artifacts/sweep_large_halo.py
"""
import json, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent.parent))
import bench

bench.HALO = 20
CONFIGS = [(8, 8), (16, 8), (16, 16), (32, 8)]
results = {}
for b in CONFIGS:
    bench.BLOCK = b
    t0 = time.perf_counter()
    try:
        sps, dt = bench.measure_steps_per_s(bench.N_GRID)
        results[f"halo20_b{b[0]}x{b[1]}"] = round(sps, 2)
        print(f"b{b}: {sps:.2f} steps/s (compile+run {time.perf_counter()-t0:.0f}s)",
              flush=True)
    except Exception as e:
        results[f"halo20_b{b[0]}x{b[1]}"] = f"ERROR: {e}"[:160]
        print(f"b{b}: ERROR {e}", flush=True)
print(json.dumps(results))
Path(__file__).with_suffix(".json").write_text(json.dumps(results, indent=1))
