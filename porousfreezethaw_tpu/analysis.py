"""Post-processing / physics observables.

The reference's quantitative acceptance metrics (SURVEY §4.5):

* **ice volume fraction** per snapshot: mean of ``p > 0.5`` over the grid
  (``scripts/avg.sh``: ``ncap2 result=(p>0.5)`` then ``ncwa`` average)
* **freezing-point statistic**: mean of ``|(p > 0.5) * u|``
  (``scripts/freezing_point_depression.sh``, ``ncwa -y mabs``)
* **DEM solids volume fraction eps_s**: fraction of a res^3 cell-centered
  sample grid of the unit box covered by spheres of radius r
  (``apps/sphere-collider/OUTPUT/calc_epss.c``)

All are jittable reductions; file-series helpers mirror the shell scripts.
"""

from __future__ import annotations

import glob as _glob
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .io.csv_snaps import read_dem_snapshot
from .io.netcdf3 import read_netcdf


# ---------------------------------------------------------------------------
# freezing-simulator observables
# ---------------------------------------------------------------------------

def ice_volume_fraction(p: np.ndarray, threshold: float = 0.5) -> float:
    """Mean of (p > threshold) — scripts/avg.sh's FORMULA="p>0.5"."""
    import jax.numpy as jnp
    return float(jnp.mean((jnp.asarray(p) > threshold).astype(float)))


def freezing_point_statistic(u: np.ndarray, p: np.ndarray,
                             threshold: float = 0.5) -> float:
    """Mean of |(p > threshold) * u| (ncwa -y mabs of (p>0.5)*u)."""
    import jax.numpy as jnp
    masked = jnp.where(jnp.asarray(p) > threshold, jnp.asarray(u), 0.0)
    return float(jnp.mean(jnp.abs(masked)))


def snapshot_series(pattern_or_dir: str) -> List[str]:
    """Sorted snapshot files: a directory (``*.ncd``) or a glob pattern."""
    if os.path.isdir(pattern_or_dir):
        pattern = os.path.join(pattern_or_dir, "*.ncd")
    else:
        pattern = pattern_or_dir
    return sorted(_glob.glob(pattern))


def series_statistics(pattern_or_dir: str) -> Dict[str, List[float]]:
    """Per-snapshot t, ice volume fraction, and freezing-point statistic
    over a snapshot series — the avg.sh / freezing_point_depression.sh
    pipelines in one pass."""
    out: Dict[str, List[float]] = {"t": [], "ice_fraction": [],
                                   "freezing_point": []}
    for path in snapshot_series(pattern_or_dir):
        data = read_netcdf(path)
        u = data.variables["u"]
        p = data.variables["p"]
        out["t"].append(float(data.attrs.get("t", np.nan)))
        out["ice_fraction"].append(ice_volume_fraction(p))
        out["freezing_point"].append(freezing_point_statistic(u, p))
    return out


# ---------------------------------------------------------------------------
# DEM solids fraction (calc_epss)
# ---------------------------------------------------------------------------

def eps_s(positions: np.ndarray, r: float = 0.1, res: int = 100,
          box_from: Sequence[float] = (0.0, 0.0, 0.0),
          box_to: Sequence[float] = (1.0, 1.0, 1.0)) -> float:
    """Solids volume fraction: fraction of res^3 cell-centered sample
    points inside any sphere (calc_epss.c:40-63), vectorized as a jitted
    occupancy reduction."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _eps(pos):
        f = jnp.asarray(box_from, dtype=float)
        t = jnp.asarray(box_to, dtype=float)
        ax = [f[d] + (t[d] - f[d]) * (0.5 + jnp.arange(res)) / res
              for d in range(3)]
        X = ax[0][None, :, None]
        Y = ax[1][:, None, None]

        # stream one z-plane of the sample grid at a time (res^2 x n
        # distances per plane) instead of materializing the full
        # (res^3 x n) tensor — the reference's calc_epss.c:40-63 streams
        # the same way; at res=100, n=200 the dense form is 1.6 GB
        def plane_hits(z):
            d2 = ((X - pos[:, 0]) ** 2 + (Y - pos[:, 1]) ** 2
                  + (z - pos[:, 2]) ** 2)
            # a sample point inside several spheres counts once per
            # sphere, exactly like the reference's += over all spheres
            return jnp.sum(d2 <= r * r)

        hits = jnp.sum(jax.lax.map(plane_hits, ax[2]))
        return hits / res**3

    return float(_eps(jnp.asarray(positions, dtype=float)))


def eps_s_series(output_dir: str, r: float = 0.1, res: int = 100,
                 snapshots: int = 400, stride: int = 2,
                 base: str = "snap") -> List[float]:
    """eps_s over a snapshot series (calc_epss.c's snap_stride loop)."""
    out = []
    for snap in range(stride, snapshots + 1, stride):
        path = os.path.join(output_dir, f"{base}_{snap:03d}.csv")
        cols = read_dem_snapshot(path)
        pos = np.stack([cols["x"], cols["y"], cols["z"]], axis=1)
        out.append(eps_s(pos, r=r, res=res))
    return out
