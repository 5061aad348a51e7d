"""Round-4 sweep B: bf16 MXU dots at 256^3.

At 128^3 bf16 was neutral (kernels VPU-bound on one-hot construction,
sweep_r2/r3); at 256^3 the MXU MAC count per particle grows ~4x (window
area with halo ~12 x N3=256 contraction), so the dots may now dominate and
bf16 (full-rate MXU, ~4x f32) could finally pay.  bf16_grad is
statistically safe (force path only; MH accepts on f32 psi); bf16_dep
rounds the density (~2^-9 relative) and is a documented knob.

Writes sweep_r4_256b.json.  Usage: timeout 3000 python artifacts/sweep_r4_256b.py
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import bench


def run(tag, **overrides):
    defaults = dict(PALLAS=True, HALO=0, BLOCK=(8, 8), BLOCK_DEP=None,
                    BF16_GRAD=False, BF16_DEP=False,
                    TAIL=False)  # recorded pre-tail-split (worst-case halo)
    defaults.update(overrides)
    for k, v in defaults.items():
        setattr(bench, k, v)
    sps, dt = bench.measure_steps_per_s(256)
    print(f"{tag}: {sps:.3f} steps/s ({dt:.1f}s)", flush=True)
    return {"steps_per_s": round(sps, 3), "dt_s": round(dt, 2)}


def main():
    results = {}
    results["256_bf16_grad"] = run("256_bf16_grad", BF16_GRAD=True)
    results["256_bf16_both"] = run("256_bf16_both", BF16_GRAD=True,
                                   BF16_DEP=True)
    out = Path(__file__).with_name("sweep_r4_256b.json")
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
