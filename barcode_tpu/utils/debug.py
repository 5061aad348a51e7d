"""Debug utilities — array statistics and quick field dumps.

Parity: /root/reference/barlib/src/debug.cc:19-311 (debug_array_statistics,
debug_scalar_dump, the struct printers become dataclass reprs for free).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np


def array_statistics(arr, name: str = "") -> dict:
    """min/max/mean/std/NaN count of a field (debug_array_statistics)."""
    a = np.asarray(arr)
    finite = np.isfinite(a)
    stats = {
        "name": name,
        "shape": a.shape,
        "min": float(a[finite].min()) if finite.any() else float("nan"),
        "max": float(a[finite].max()) if finite.any() else float("nan"),
        "mean": float(a[finite].mean()) if finite.any() else float("nan"),
        "std": float(a[finite].std()) if finite.any() else float("nan"),
        "n_nonfinite": int((~finite).sum()),
    }
    return stats


def print_array_statistics(arr, name: str = "") -> None:
    s = array_statistics(arr, name)
    print(f"[{s['name']}] shape={s['shape']} min={s['min']:.4g} "
          f"max={s['max']:.4g} mean={s['mean']:.4g} std={s['std']:.4g}"
          + (f" NONFINITE={s['n_nonfinite']}" if s["n_nonfinite"] else ""))


def quick_dump_scalar(arr, out_dir, name: str, iteration: int = 0,
                      with_spectrum: bool = False, grid=None, nbin: int = 64):
    """Field snapshot (+ optionally its spectrum) for debugging
    (debug_scalar_dump / quick_dump_scalar)."""
    from barcode_tpu import io as bio

    out_dir = Path(out_dir)
    path = bio.write_array(out_dir / f"{name}_{iteration}", np.asarray(arr))
    if with_spectrum and grid is not None:
        import jax
        from barcode_tpu.grid import fourier

        km, pw, _ = jax.jit(
            lambda x: fourier.measure_spectrum(x, grid, nbin))(arr)
        bio.dump_spectrum(out_dir / f"{name}_{iteration}_spec.dat", km, pw)
    return path
