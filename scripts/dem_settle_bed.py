#!/usr/bin/env python
"""Regenerate a porous glass-bead bed with this framework's DEM simulator
and validate its solids fraction against the reference ensemble.

Reproduces the reference coupling pipeline end to end
(``apps/sphere-collider`` -> ``extract_final_positions.m`` ->
``data/spheres_final_positions*.txt``): 200 spheres, friction_angular
variant, T=8, 400 snapshots, then eps_s over a 100^3 sample grid
(``OUTPUT/calc_epss.c``).

Reference yardsticks (measured in round 2):
* reference C DEM final snapshot (snapshots.tgz): eps_s = 0.6549
* shipped MATLAB beds: eps_s = 0.640 / 0.713 (ensemble spread)
* this framework's bed (data/spheres_final_positions_owndem.txt):
  eps_s = 0.6521, z-extent 0.078..1.340 (reference: 0.078..1.336)

Usage: python scripts/dem_settle_bed.py [--out DIR] [--platform cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/dem_settle")
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--precision", default="f64", choices=["f32", "f64"])
    ap.add_argument("--neighbor", default="dense",
                    choices=["dense", "cell_list", "cell_roll",
                             "cell_lanes"])
    ap.add_argument("--device-buffer", type=int, default=0,
                    help="batch B snapshots per dispatched program "
                         "(collapses per-snapshot tunnel round trips)")
    args = ap.parse_args()

    from porousfreezethaw_tpu.apps.spheres import main as spheres_main

    final = os.path.join(args.out, "spheres_final_positions.txt")
    argv = ["--variant", "friction_angular", "--n", str(args.n),
            "--precision", args.precision,
            "--icond", "dense", "--snapshots", "400", "--final-time", "8",
            "--neighbor", args.neighbor,
            "--output", os.path.join(args.out, "OUTPUT"),
            "--final-positions", final]
    if args.platform:
        argv += ["--platform", args.platform]
    if args.device_buffer:
        argv += ["--device-buffer", str(args.device_buffer)]
    rc = spheres_main(argv)
    if rc:
        return rc

    import numpy as np
    from porousfreezethaw_tpu.analysis import eps_s

    pos = np.loadtxt(final)
    val = eps_s(pos, r=0.1, res=100)
    print(f"bed: n={len(pos)}  z {pos[:, 2].min():.3f}..{pos[:, 2].max():.3f}"
          f"  eps_s = {val:.4f}  (reference ensemble 0.64..0.71)")
    return 0 if 0.60 < val < 0.72 else 1


if __name__ == "__main__":
    sys.exit(main())
