"""Round-4 sweep: end-to-end 256^3 (ladder config 5 scale, single chip).

VERDICT r3 #1: the round-3 kernel wins were gated off at 256^3 by the VMEM
window; the streamed-window deposit (commit 3ae1413) lifts the gate.  This
measures what that buys END-TO-END (the probe only timed the deposit):
  - auto   : block_dep auto -> (16,16) streamed at 256^3 (the new default)
  - r2     : block_dep (8,8) full-window (the round-2 fallback config)
plus a 128^3 sanity point to confirm the headline didn't move.

Writes sweep_r4_256.json.  Usage: timeout 3000 python artifacts/sweep_r4_256.py
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import bench


def run(n_grid, tag, **overrides):
    defaults = dict(PALLAS=True, HALO=0, BLOCK=(8, 8), BLOCK_DEP=None,
                    BF16_GRAD=False, BF16_DEP=False,
                    TAIL=False)  # recorded pre-tail-split (worst-case halo)
    defaults.update(overrides)
    for k, v in defaults.items():
        setattr(bench, k, v)
    sps, dt = bench.measure_steps_per_s(n_grid)
    print(f"{tag}: {sps:.3f} steps/s ({dt:.1f}s measured)", flush=True)
    return {"steps_per_s": round(sps, 3), "dt_s": round(dt, 2)}


def main():
    results = {}
    # headline sanity first (cheap compile, warms the relay)
    results["128_auto"] = run(128, "128_auto")
    # config-5 scale: the new streamed (16,16) default vs the round-2 config
    results["256_auto"] = run(256, "256_auto")
    results["256_r2_b8"] = run(256, "256_r2_b8", BLOCK_DEP=(8, 8))
    out = Path(__file__).with_name("sweep_r4_256.json")
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
