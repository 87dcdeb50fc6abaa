"""Benchmark harness: freezing-stencil throughput on the attached device.

Measures the flagship compute path — the adaptive Runge-Kutta-Merson solve
of the GradP phase-field + heat system (calc_mode 0) on the reference's MR
grid (100 x 100 x 200) with the shipped Params physics and realistic
initial conditions — and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N/baseline}

Baseline: the reference's PhysRevE-2025 GradP 1-node run sustains
~2.4e8 cell*RHS-evals/s on 32 CPU cores (BASELINE.md: 2e6 cells x
2,073,396 attempted steps x 5 stages / 86,247 s).  vs_baseline is the
per-chip speedup over that full reference node.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

BASELINE_CELL_RHS_EVALS_PER_S = 2.4e8  # reference 1 node / 32 cores (BASELINE.md)

REFERENCE_BALLS = ("/root/reference/apps/intertrack-hybrid-S-freezing/"
                   "data/spheres_positions.txt")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def synthetic_ball_positions(n=200, seed=0):
    """A jittered-grid porous bed in the unit box (raw coordinates, same
    convention as the DEM output consumed by the reference) — used when the
    shipped positions file is unavailable."""
    rng = np.random.RandomState(seed)
    r = 0.1
    per_row = 4
    pos = []
    i = 0
    while len(pos) < n:
        x = (i % per_row + 0.5) / per_row
        y = ((i // per_row) % per_row + 0.5) / per_row
        z = (i // (per_row * per_row)) * 2 * r * 0.95 + r
        pos.append([x + 0.02 * rng.randn(), y + 0.02 * rng.randn(), z])
        i += 1
    return np.asarray(pos)


BASELINE_DEM_PARTICLE_EVALS_PER_S = 820.0
# MATLAB twin, 200-sphere dense porous-bed case: 200 particles x 151,969
# f-evals / 37,059 s (BASELINE.md spheres_200_dense.log)


def bench_dem(args):
    import jax
    import jax.numpy as jnp
    from porousfreezethaw_tpu.models.dem import DEMConfig, icond_dense, make_dem_rhs
    from porousfreezethaw_tpu.solvers.merson import (
        MersonParams, merson_init, merson_solve)

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    cfg = DEMConfig(variant="friction_angular", n=args.n_spheres)
    y0, _ = icond_dense(cfg, seed=0)
    rhs = make_dem_rhs(cfg, dtype=jnp.float32)
    steps = args.steps or 20000
    params = MersonParams(delta=cfg.delta, h_min=cfg.ht_min, max_steps=steps,
                          handle_nan=True)
    solve = jax.jit(lambda st: merson_solve(rhs, st, 1e9, params))
    state = merson_init({k: jnp.asarray(v, jnp.float32) for k, v in y0.items()},
                        0.0, cfg.ht)
    log("compiling + warmup...")
    state, _ = solve(state)
    n0 = int(state.steps_total)
    log(f"timing {steps} attempted steps (t={float(state.t):.3f}s sim)...")
    t0 = time.time()
    state, _ = solve(state)
    done = int(state.steps_total) - n0
    wall = time.time() - t0
    value = 5.0 * cfg.n * done / wall
    log(f"{done} attempts, {wall:.2f}s -> {value:.3e} particle*RHS-evals/s "
        f"(t={float(state.t):.3f}s sim)")
    print(json.dumps({
        "metric": "dem_200_particle_rhs_evals_per_s",
        "value": value,
        "unit": "particle*RHS-evals/s/chip",
        "vs_baseline": value / BASELINE_DEM_PARTICLE_EVALS_PER_S,
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", choices=["freezing", "dem"], default="freezing")
    ap.add_argument("--n-spheres", type=int, default=200)
    ap.add_argument("--grid-nodes", type=int, default=200,
                    help="cells along the longest side: 100=LR, 200=MR, 400=HR")
    ap.add_argument("--steps", type=int, default=0,
                    help="attempted Merson steps to time (0 = auto)")
    ap.add_argument("--dtype", choices=["f32", "f64"], default="f32")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu for testing)")
    ap.add_argument("--ball-positions", default=None)
    ap.add_argument("--bz", type=int, default=0,
                    help="force the Pallas z-block size (0 = auto)")
    ap.add_argument("--vmem-mb", type=int, default=0,
                    help="force the Mosaic scoped-vmem limit in MiB (0 = default)")
    ap.add_argument("--fused", choices=["auto", "attempt", "stage", "on",
                                        "off"], default="auto",
                    help="Pallas path: 'stage' = per-stage kernels with "
                         "fused stage-5 tail (fastest measured), "
                         "'attempt' = double-buffered full-attempt "
                         "pipeline, 'auto'/'on' = stage")
    args = ap.parse_args()

    if args.grid_nodes < 4:
        ap.error("--grid-nodes must be >= 4")

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.dtype == "f64":
        jax.config.update("jax_enable_x64", True)
    if args.suite == "dem":
        return bench_dem(args)
    import jax.numpy as jnp

    from porousfreezethaw_tpu.cases import freezing_params_text
    from porousfreezethaw_tpu.config import parse_param_file
    from porousfreezethaw_tpu.core.grid import GridGeometry
    from porousfreezethaw_tpu.models.freezing import (
        FreezingParams, build_glass_field, build_initial_conditions,
        make_rhs)
    from porousfreezethaw_tpu.models.freezing.glass import read_ball_positions
    from porousfreezethaw_tpu.solvers.merson import (
        MersonParams, merson_init, merson_solve)

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    dtype = np.float64 if args.dtype == "f64" else np.float32

    pf = parse_param_file(
        freezing_params_text(grid_nodes=args.grid_nodes), env={"OUTPUT": "/tmp"})
    prm = FreezingParams.from_dict(pf.vars)
    geom = GridGeometry(pf.vars["L1"], pf.vars["L2"], pf.vars["L3"],
                        int(pf.vars["n1"]), int(pf.vars["n2"]),
                        int(pf.vars["n3"]))
    log(f"grid: {geom.n1} x {geom.n2} x {geom.n3} "
        f"({geom.num_cells/1e6:.2f} M cells), dtype {args.dtype}")

    w0 = build_initial_conditions(geom, prm, pf.icond_formulas, dtype=dtype)
    ball_file = args.ball_positions or (
        REFERENCE_BALLS if os.path.exists(REFERENCE_BALLS) else None)
    if ball_file:
        balls = read_ball_positions(ball_file, prm)
    else:
        raw = synthetic_ball_positions()
        balls = raw * prm.beads_scaling + np.array(
            [prm.beads_offset_x, prm.beads_offset_y, prm.beads_offset_z])
    w0[2] = build_glass_field(geom, prm, balls, w0[2])

    # f32 production conditioning: store u - u_star (exact; see
    # models/freezing/parameters.py::shift_temperature_origin)
    if dtype == np.float32:
        from porousfreezethaw_tpu.models.freezing import (
            shift_temperature_origin)
        w0[0] -= prm.u_star
        prm_solver = shift_temperature_origin(prm, prm.u_star)
    else:
        prm_solver = prm

    rhs = make_rhs(geom, prm_solver, calc_mode=0)
    delta = pf.vars["delta"]

    use_fused = (args.fused in ("on", "attempt", "stage") or (
        args.fused == "auto" and dtype == np.float32
        and jax.devices()[0].platform not in ("cpu",)))
    stage_fn = None
    attempt_fn = None
    if use_fused:
        from porousfreezethaw_tpu.ops.pallas.stencil import (
            make_fused_attempt, make_fused_stage, pad_state)
        if args.fused == "attempt":
            attempt_fn = make_fused_attempt(geom, prm_solver, calc_mode=0,
                                            bz=args.bz)
            log("fused Pallas attempt pipeline: ON")
        else:
            stage_fn = make_fused_stage(geom, prm_solver, calc_mode=0,
                                        bz=args.bz,
                                        vmem_limit_mb=args.vmem_mb)
            log("fused Pallas stage kernels (stage-5 tail): ON")

    steps = args.steps
    if steps == 0:
        steps = max(20, int(4e8 / geom.num_cells))

    # NaN backoff on (the reference's recommended setting for rough starts,
    # RK_Asolver.c:96-131) and a tame initial tau: in f32 the tau=1
    # transient overflows the stage cascade
    params = MersonParams(delta=delta, h_min=pf.vars["tau_min"],
                          max_steps=steps, handle_nan=True)
    solve = jax.jit(lambda st: merson_solve(rhs, st, 1e9, params,
                                            stage_fn=stage_fn,
                                            attempt_fn=attempt_fn))

    def run(state):
        out, status = solve(state)
        jax.block_until_ready(out.y)
        return out

    w_dev = jnp.asarray(w0, dtype)
    if use_fused:
        w_dev = pad_state(w_dev, geom)
    state = merson_init(w_dev, 0.0, min(pf.vars["tau"], 1e-4))
    log("compiling + warmup...")
    t0 = time.time()
    state = run(state)
    log(f"warmup done in {time.time()-t0:.1f}s "
        f"({int(state.steps)}/{int(state.steps_total)} steps)")

    log(f"timing {steps} attempted steps...")
    t0 = time.time()
    before = int(state.steps_total)
    state = run(state)
    # fetch a scalar to really synchronize (block_until_ready can return
    # early through the remote-TPU tunnel)
    done = int(state.steps_total) - before
    wall = time.time() - t0

    evals = 5.0 * geom.num_cells * done
    value = evals / wall
    log(f"{done} attempted steps ({int(state.steps)} successful so far), "
        f"t={float(state.t):.4f}s sim, {wall:.2f}s wall -> "
        f"{value:.3e} cell*RHS-evals/s")

    print(json.dumps({
        "metric": "freezing_gradp_cell_rhs_evals_per_s",
        "value": value,
        "unit": "cell*RHS-evals/s/chip",
        "vs_baseline": value / BASELINE_CELL_RHS_EVALS_PER_S,
    }))


if __name__ == "__main__":
    main()
