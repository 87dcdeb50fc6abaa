"""Benchmark harness: freezing-stencil throughput on the attached device.

Default: the flagship compute path — the adaptive Runge-Kutta-Merson solve
of the GradP phase-field + heat system (calc_mode 0) on the reference's MR
grid (100 x 100 x 200) with the shipped Params physics and realistic
initial conditions — warmed into the stepping regime, then timed
sustained.  Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N/baseline}

``--matrix`` benches the whole BASELINE.md freezing matrix (LR/MR/HR x
GradP/SigmaP1-P/Temp) plus the DEM contact kernel, printing one JSON line
per case (and writing BENCH_MATRIX.json); the final line is the headline
MR GradP entry, preserving the one-line contract.

vs_baseline compares one chip against the FULL reference configuration of
that case (1-7 CPU nodes; per-case sustained cell*RHS-evals/s derived
from the shipped logs, BASELINE.md).
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

# reference sustained throughput per case, cells x attempted steps x 5
# stages / wall seconds from the shipped logs (BASELINE.md); config noted
BASELINES = {
    # (grid_nodes, calc_mode): evals/s
    (100, 0): 1.12e8,   # LR GradP, 32 cores (2:42:11, 870,988 att)
    (100, 1): 1.19e8,   # LR SigmaP1-P, 32 cores (1:10:38, 404,490 att)
    (100, 2): 3.11e8,   # LR Temp, 32 cores (0:23:48, 355,469 att)
    (200, 0): 2.40e8,   # MR GradP PhysRevE, 32 cores (23:57:27, 2,073,396)
    (200, 1): 2.45e8,   # MR SigmaP1-P PhysRevE, 32 cores (18:51:51)
    (200, 2): 2.00e8,   # MR Temp PhysRevE, 32 cores (20:33:06)
    (400, 1): 1.79e9,   # HR SigmaP1-P smallsigma, 384 cores (90:30:55)
    (400, 2): 1.22e9,   # HR Temp, 224 cores (104:47:12)
    (400, 0): None,     # no HR GradP reference run exists
}
BASELINE_CELL_RHS_EVALS_PER_S = BASELINES[(200, 0)]

MODE_NAMES = {0: "gradp", 1: "sigmap", 2: "temp"}
GRID_NAMES = {100: "lr", 200: "mr", 400: "hr"}

REFERENCE_BALLS = ("/root/reference/apps/intertrack-hybrid-S-freezing/"
                   "data/spheres_positions.txt")
REPO_BALLS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "data", "spheres_positions.txt")


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


def bench_dem(args, neighbor="dense", n_spheres=None, chunk_cap=512,
              cell_capacity=16):
    import jax
    import jax.numpy as jnp
    from porousfreezethaw_tpu.models.dem import (
        DEMConfig, icond_dense, make_dem_rhs)
    from porousfreezethaw_tpu.solvers.merson import (
        MersonParams, merson_init, merson_solve)

    n = n_spheres or args.n_spheres
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    # large-n beds use a proportionally smaller radius, like a finer bed
    r = 0.1 if n <= 400 else 0.1 * (200.0 / n) ** (1.0 / 3.0)
    cfg = DEMConfig(variant="friction_angular", n=n, r=r)
    y0, _ = icond_dense(cfg, seed=0)
    rhs = make_dem_rhs(cfg, dtype=jnp.float32, neighbor=neighbor,
                       cell_capacity=cell_capacity)
    steps = args.steps or (20000 if n <= 400 else 2000)
    # chunked solve calls (the app's service-path pattern): a while_loop
    # with a very large baked trip count reproducibly faults the axon
    # TPU worker (PERFORMANCE.md known issue); <=512-attempt programs
    # are clean and the chunk boundary costs one scalar fetch
    chunk = min(steps, chunk_cap)
    params = MersonParams(delta=cfg.delta, h_min=cfg.ht_min, max_steps=chunk,
                          handle_nan=True)
    solve = jax.jit(lambda st: merson_solve(rhs, st, 1e9, params))

    def run(st, n_attempts):
        start = int(st.steps_total)
        while int(st.steps_total) - start < n_attempts:
            st, _ = solve(st)
            if rhs.neighbor_struct is not None:
                # guarded capacity (advisor r4): mid-run densification
                # past the structure's capacity would drop pairs — the
                # kernel already NaN-poisons, this names the cause
                occ = rhs.neighbor_struct.cell_occupancy(st.y["pos"])
                if occ > rhs.neighbor_struct.capacity:
                    raise RuntimeError(
                        f"cell occupancy {occ} exceeds capacity "
                        f"{rhs.neighbor_struct.capacity} at t="
                        f"{float(st.t):.4f} — rerun with a larger "
                        f"--cell-capacity or --neighbor dense")
        return st

    state = merson_init({k: jnp.asarray(v, jnp.float32) for k, v in y0.items()},
                        0.0, cfg.ht)
    log(f"compiling + warmup (n={n}, neighbor={neighbor})...")
    state = run(state, steps)
    n0 = int(state.steps_total)
    log(f"timing {steps} attempted steps (t={float(state.t):.3f}s sim)...")
    t0 = time.time()
    state = run(state, steps)
    done = int(state.steps_total) - n0
    wall = time.time() - t0
    value = 5.0 * cfg.n * done / wall
    log(f"{done} attempts, {wall:.2f}s -> {value:.3e} particle*RHS-evals/s "
        f"(t={float(state.t):.3f}s sim)")
    suffix = {"dense": "", "cell_list": "_celllist",
              "cell_roll": "_cellroll",
              "cell_lanes": "_celllanes"}[neighbor]
    return {
        "metric": f"dem_{n}{suffix}_particle_rhs_evals_per_s",
        "value": value,
        "unit": "particle*RHS-evals/s/chip",
        "vs_baseline": (value / BASELINE_DEM_PARTICLE_EVALS_PER_S
                        if n == 200 else None),
    }


def bench_freezing(args, grid_nodes=None, calc_mode=0):
    import jax
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

    grid_nodes = grid_nodes or args.grid_nodes
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    dtype = np.float64 if args.dtype == "f64" else np.float32

    pf = parse_param_file(
        freezing_params_text(grid_nodes=grid_nodes, calc_mode=calc_mode),
        env={"OUTPUT": "/tmp"})
    prm = FreezingParams.from_dict(pf.vars)
    geom = GridGeometry(pf.vars["L1"], pf.vars["L2"], pf.vars["L3"],
                        int(pf.vars["n1"]), int(pf.vars["n2"]),
                        int(pf.vars["n3"]))
    log(f"grid: {geom.n1} x {geom.n2} x {geom.n3} "
        f"({geom.num_cells/1e6:.2f} M cells), calc_mode {calc_mode}, "
        f"dtype {args.dtype}")

    icond = dict(pf.icond_formulas)
    if calc_mode == 2:
        icond["p"] = "0"  # Model 2 requires p=0 (reference Params comment)
    w0 = build_initial_conditions(geom, prm, icond, dtype=dtype)
    ball_file = args.ball_positions or next(
        (p for p in (REPO_BALLS, REFERENCE_BALLS) if os.path.exists(p)), None)
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

    rhs = make_rhs(geom, prm_solver, calc_mode=calc_mode)
    delta = pf.vars["delta"]

    use_fused = (args.fused in ("on", "attempt", "stage", "delta") or (
        args.fused == "auto" and dtype == np.float32
        and jax.devices()[0].platform not in ("cpu",)))
    stage_fn = None
    attempt_fn = None
    mesh = None
    if args.mesh:
        from porousfreezethaw_tpu.parallel.sharding import make_mesh
        mesh = make_mesh(args.mesh)
    if use_fused:
        from porousfreezethaw_tpu.ops.pallas.stencil import (
            make_fused_attempt, make_fused_stage, pad_state)
        if mesh is not None and "y" in mesh.axis_names:
            # 2-D (z, y) sharded delta path (round 5)
            from porousfreezethaw_tpu.parallel.fused import (
                ShardedDeltaAttempt2D)
            attempt_fn = ShardedDeltaAttempt2D(
                geom, prm_solver, calc_mode, mesh)
            log(f"2-D sharded delta attempt: ON over "
                f"{dict(zip(mesh.axis_names, mesh.devices.shape))}")
        elif mesh is not None:
            from porousfreezethaw_tpu.parallel.fused import (
                make_sharded_fused_stage)
            stage_fn = make_sharded_fused_stage(
                geom, prm_solver, calc_mode, mesh,
                overlap=not args.no_overlap)
            log(f"fused Pallas stage kernels: ON (sharded over "
                f"{dict(zip(mesh.axis_names, mesh.devices.shape))}, "
                f"overlap={'ON' if not args.no_overlap else 'OFF'})")
        elif args.fused == "delta":
            from porousfreezethaw_tpu.ops.pallas.stencil import (
                make_delta_attempt)
            attempt_fn = make_delta_attempt(geom, prm_solver,
                                            calc_mode=calc_mode, bz=args.bz)
            log("fused Pallas increment-form (delta) attempt: ON")
        elif args.fused == "attempt":
            attempt_fn = make_fused_attempt(geom, prm_solver,
                                            calc_mode=calc_mode, bz=args.bz)
            log("fused Pallas attempt pipeline: ON")
        else:
            stage_fn = make_fused_stage(geom, prm_solver,
                                        calc_mode=calc_mode, bz=args.bz,
                                        vmem_limit_mb=args.vmem_mb)
            log("fused Pallas stage kernels (stage-5 tail): ON")

    steps = args.steps
    if steps == 0:
        steps = max(20, int(4e8 / geom.num_cells))
    warm = args.warm_steps
    if warm == 0:
        warm = min(4 * steps, max(steps, int(2e9 / geom.num_cells)))

    # NaN backoff on (the reference's recommended setting for rough starts,
    # RK_Asolver.c:96-131) and a tame initial tau: in f32 the tau=1
    # transient overflows the stage cascade.  accept_growth_min is the f32
    # noise-floor escape (see MersonParams) — without it the f32 GradP run
    # pins at h~1e-9 and never reaches the physical stepping regime; the
    # intertrack app applies the same default.
    params = MersonParams(
        delta=delta, h_min=pf.vars["tau_min"], max_steps=steps,
        handle_nan=True,
        # the increment-form attempt has no estimator noise floor, so it
        # keeps the exact reference step-control rule
        accept_growth_min=(1.05 if dtype == np.float32
                           and attempt_fn is None else 0.0))
    # ONE compiled program for both warmup and timing: max_steps is baked
    # into the while_loop, so warm/timed programs with different counts
    # would each pay their own (potentially cold through the remote-compile
    # tunnel) compilation — round 2's recorded bench lost 14x to exactly
    # that: the timed section included the second program's compile.
    solve = jax.jit(lambda st: merson_solve(
        rhs, st, 1e9, params, stage_fn=stage_fn, attempt_fn=attempt_fn))

    w_dev = jnp.asarray(w0, dtype)
    if use_fused:
        if mesh is not None and "y" in mesh.axis_names:
            from porousfreezethaw_tpu.parallel.fused import (
                pad_state_2d, padded_sharding_2d)
            w_dev = jax.device_put(
                pad_state_2d(w_dev, geom, mesh.shape["y"]),
                padded_sharding_2d(mesh))
        else:
            w_dev = pad_state(w_dev, geom)
            if mesh is not None:
                from porousfreezethaw_tpu.parallel.fused import (
                    padded_sharding)
                w_dev = jax.device_put(w_dev, padded_sharding(mesh))
    state = merson_init(w_dev, 0.0, min(pf.vars["tau"], 1e-4))
    log(f"compiling + warming >= {warm} attempted steps into the stepping "
        f"regime ({steps} per solver call)...")
    t0 = time.time()
    for _ in range(max(1, -(-warm // steps))):
        state, _ = solve(state)
    # fetch a scalar to really synchronize (block_until_ready can return
    # early through the remote-TPU tunnel)
    t_sim = float(state.t)
    log(f"warmup done in {time.time()-t0:.1f}s "
        f"({int(state.steps)}/{int(state.steps_total)} steps, "
        f"t={t_sim:.4f}s sim, h={float(state.h):.3e})")

    log(f"timing {steps} attempted steps (sustained)...")
    t0 = time.time()
    before = int(state.steps_total)
    state, _ = solve(state)
    done = int(state.steps_total) - before
    wall = time.time() - t0

    evals = 5.0 * geom.num_cells * done
    value = evals / wall
    log(f"{done} attempted steps ({int(state.steps)} successful so far), "
        f"t={float(state.t):.4f}s sim, {wall:.2f}s wall -> "
        f"{value:.3e} cell*RHS-evals/s")

    base = BASELINES.get((grid_nodes, calc_mode))
    if grid_nodes == 200 and calc_mode == 0:
        metric = "freezing_gradp_cell_rhs_evals_per_s"  # headline contract
    else:
        metric = (f"freezing_{MODE_NAMES[calc_mode]}_"
                  f"{GRID_NAMES.get(grid_nodes, grid_nodes)}"
                  f"_cell_rhs_evals_per_s")
    return {
        "metric": metric,
        "value": value,
        "unit": "cell*RHS-evals/s/chip",
        "vs_baseline": (value / base) if base else None,
        "ms_per_attempt": wall / done * 1e3,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", choices=["freezing", "dem"], default="freezing")
    ap.add_argument("--matrix", action="store_true",
                    help="bench the full LR/MR/HR x GradP/SigmaP/Temp "
                         "matrix + DEM; one JSON line each (each row in "
                         "its own subprocess)")
    ap.add_argument("--row", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--n-spheres", type=int, default=200)
    ap.add_argument("--neighbor", choices=["dense", "cell_list",
                                           "cell_roll", "cell_lanes"],
                    default="dense",
                    help="DEM neighbor strategy (--suite dem)")
    ap.add_argument("--grid-nodes", type=int, default=200,
                    help="cells along the longest side: 100=LR, 200=MR, 400=HR")
    ap.add_argument("--calc-mode", type=int, default=0, choices=[0, 1, 2])
    ap.add_argument("--steps", type=int, default=0,
                    help="attempted Merson steps to time (0 = auto)")
    ap.add_argument("--warm-steps", type=int, default=0,
                    help="attempted steps before timing (0 = auto)")
    ap.add_argument("--dtype", choices=["f32", "f64"], default="f32")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu for testing)")
    ap.add_argument("--mesh", default=None,
                    help="bench the sharded fused path over a device mesh "
                         "spec (e.g. 'z')")
    ap.add_argument("--no-overlap", action="store_true",
                    help="disable the interior/edge halo-overlap split")
    ap.add_argument("--ball-positions", default=None)
    ap.add_argument("--bz", type=int, default=0,
                    help="force the Pallas z-block size (0 = auto)")
    ap.add_argument("--vmem-mb", type=int, default=0,
                    help="force the Mosaic scoped-vmem limit in MiB (0 = default)")
    ap.add_argument("--profile-dir", default=None,
                    help="capture a jax.profiler trace (xplane/tensorboard) "
                         "of the timed section into this directory")
    ap.add_argument("--fused", choices=["auto", "attempt", "stage", "delta",
                                        "on", "off"], default="auto",
                    help="Pallas path: 'stage' = per-stage kernels with "
                         "fused stage-5 tail (fastest per attempt), "
                         "'delta' = increment-form attempt (the app's "
                         "f32 GradP default: no estimator noise floor, "
                         "fewer steps end-to-end), 'attempt' = "
                         "double-buffered full-attempt pipeline, "
                         "'auto'/'on' = stage")
    args = ap.parse_args()

    if args.grid_nodes < 4:
        ap.error("--grid-nodes must be >= 4")

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # x64 always on: field dtype is selected separately; the Merson
    # controller scalars must be f64 (see apps/intertrack.py)
    jax.config.update("jax_enable_x64", True)

    import contextlib

    @contextlib.contextmanager
    def maybe_profile():
        if args.profile_dir:
            with jax.profiler.trace(args.profile_dir):
                yield
            log(f"profiler trace written to {args.profile_dir}")
        else:
            yield

    if args.row:
        # internal: one matrix row in this process (spawned by --matrix)
        parts = args.row.split(":")
        if parts[0] == "freezing":
            gn, cm = int(parts[1]), int(parts[2])
            extra = parts[3] if len(parts) > 3 else ""
            if extra == "delta":
                args.fused = "delta"
            elif extra.startswith("mesh="):
                args.mesh = extra[5:]
            rec = bench_freezing(args, grid_nodes=gn, calc_mode=cm)
            if extra:
                rec["metric"] += ("_delta" if extra == "delta"
                                  else f"_sharded_{extra[5:]}")
        else:
            n, nb, cap = int(parts[1]), parts[2], int(parts[3])
            kcap = int(parts[4]) if len(parts) > 4 else 16
            rec = bench_dem(args, neighbor=nb, n_spheres=n, chunk_cap=cap,
                            cell_capacity=kcap)
            if len(parts) > 4:
                rec["metric"] += f"_k{kcap}"
        print(json.dumps(rec))
        return

    if args.matrix:
        # Each row runs in its OWN subprocess: the axon remote worker
        # occasionally dies mid-solve on large-trip-count programs
        # (PERFORMANCE.md known issue), and a dead worker leaves the
        # process's JAX backend wedged — an in-process retry would then
        # deterministically fail (advisor r3).  A fresh process per row
        # also gives each row a clean backend; one flaky row is retried
        # once after a recovery wait (DEM rows with a halved solve
        # chunk) and recorded as an error row if it still fails.
        def run_row(spec, timeout_s=5400):
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--row", spec, "--dtype", args.dtype]
            if args.platform:
                cmd += ["--platform", args.platform]
            # forward per-run tuning flags into the row subprocess so
            # --matrix honors them like the in-process modes (advisor
            # r4); --profile-dir is deliberately NOT forwarded — 16
            # rows would interleave traces in one directory and the
            # ~30% trace overhead would skew every number
            if args.steps:
                cmd += ["--steps", str(args.steps)]
            if args.warm_steps:
                cmd += ["--warm-steps", str(args.warm_steps)]
            if args.bz:
                cmd += ["--bz", str(args.bz)]
            if args.vmem_mb:
                cmd += ["--vmem-mb", str(args.vmem_mb)]
            if args.no_overlap:
                cmd.append("--no-overlap")
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=timeout_s)
            if out.stderr:
                log(out.stderr.rstrip()[-2000:])
            for line in reversed(out.stdout.strip().splitlines()):
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if out.returncode != 0:
                    # the row printed its record and then crashed
                    # (e.g. worker fault in teardown) — keep the
                    # number but make the failure visible (advisor r4)
                    rec["rc"] = out.returncode
                return rec
            raise RuntimeError(
                f"row {spec} produced no JSON (rc={out.returncode})")

        def row(spec, label):
            for attempt in (0, 1):
                try:
                    return run_row(spec)
                except Exception as e:  # noqa: BLE001 — record + continue
                    log(f"{label}: {type(e).__name__}: {e}")
                    if attempt:
                        return {"metric": label, "value": None,
                                "unit": None, "vs_baseline": None,
                                "error": f"{type(e).__name__}: {e}"}
                    log(f"{label}: waiting 240s for the TPU worker to "
                        f"recover, then retrying once...")
                    time.sleep(240)
                    if spec.startswith("dem:"):
                        p = spec.split(":")
                        p[3] = str(max(64, int(p[3]) // 2))
                        spec = ":".join(p)

        specs = []
        for gn in (100, 200, 400):
            for cm in (0, 1, 2):
                specs.append((f"freezing:{gn}:{cm}", f"freezing_{gn}_{cm}"))
        # the production f32 GradP numerics (increment form) and the
        # compiled sharded fused path (z=1 self-permute ring exercises
        # shard_map + Mosaic + the overlap split on one chip)
        specs.append(("freezing:200:0:delta", "freezing_200_0_delta"))
        specs.append(("freezing:200:0:mesh=z1", "freezing_200_0_sharded"))
        # the 2-D (z, y) sharded delta path compiled by Mosaic (round 5):
        # traced-mask kernels + self-permute rings on one chip
        specs.append(("freezing:200:0:mesh=z1,y1",
                      "freezing_200_0_sharded_2d"))
        # dense wins through n~2000-3000; the lane-major cell structure
        # with guarded capacity K=8 crosses over by n=4000 (round 5:
        # 9.9e5 vs 7.9e5 evals/s at n=4000 — the first cell structure
        # to beat dense on this TPU) and holds ~1e6 evals/s O(n) through
        # n=20000, the size whose dense program faults the axon worker
        # (PERFORMANCE.md)
        for n, nb, cap in ((200, "dense", 0), (2000, "dense", 0),
                           (4000, "dense", 0), (4000, "cell_lanes", 8),
                           (6000, "dense", 0), (6000, "cell_lanes", 8),
                           (10000, "cell_lanes", 8),
                           (20000, "cell_lanes", 8)):
            spec = f"dem:{n}:{nb}:512" + (f":{cap}" if cap else "")
            specs.append((spec, f"dem_{n}_{nb}" + (f"_k{cap}" if cap
                                                   else "")))

        results = []
        for spec, label in specs:
            rec = row(spec, label)
            results.append(rec)
            print(json.dumps(rec), flush=True)
        with open("BENCH_MATRIX.json", "w") as f:
            json.dump(results, f, indent=1)
        headline = next(
            (r for r in results
             if r["metric"] == "freezing_gradp_cell_rhs_evals_per_s"),
            {"metric": "freezing_gradp_cell_rhs_evals_per_s",
             "value": None, "unit": None, "vs_baseline": None,
             "error": "headline row failed; see BENCH_MATRIX.json"})
        print(json.dumps(headline))
        return

    with maybe_profile():
        if args.suite == "dem":
            rec = bench_dem(args, neighbor=args.neighbor)
        else:
            rec = bench_freezing(args, calc_mode=args.calc_mode)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
