"""Round-3 probe 2: where does the 0.76 ms/attempt go?

Times the full merson_solve at MR GradP f32 with different commit
implementations to isolate the accepted-state select cost:
  dus    - current: where over dynamic vars + static update-slice
  full   - concat + full-state where (the pre-K_VARS behavior)
  none   - no state write at all (WRONG semantics; times stages+eps only)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from porousfreezethaw_tpu.cases import freezing_params_text
from porousfreezethaw_tpu.config import parse_param_file
from porousfreezethaw_tpu.core.grid import GridGeometry
from porousfreezethaw_tpu.models.freezing import (
    FreezingParams, build_glass_field, build_initial_conditions,
    shift_temperature_origin)
from porousfreezethaw_tpu.models.freezing.glass import read_ball_positions
from porousfreezethaw_tpu.solvers.merson import (
    MersonParams, merson_init, merson_solve)
from porousfreezethaw_tpu.ops.pallas.stencil import (
    make_fused_stage, pad_state)

GN = 200
STEPS = 200

pf = parse_param_file(freezing_params_text(grid_nodes=GN, calc_mode=0),
                      env={"OUTPUT": "/tmp"})
prm = FreezingParams.from_dict(pf.vars)
geom = GridGeometry(pf.vars["L1"], pf.vars["L2"], pf.vars["L3"],
                    int(pf.vars["n1"]), int(pf.vars["n2"]), int(pf.vars["n3"]))
w0 = build_initial_conditions(geom, prm, dict(pf.icond_formulas),
                              dtype=np.float32)
balls = read_ball_positions("data/spheres_positions.txt", prm)
w0[2] = build_glass_field(geom, prm, balls, w0[2])
w0[0] -= prm.u_star
prm_s = shift_temperature_origin(prm, prm.u_star)

params = MersonParams(delta=pf.vars["delta"], h_min=pf.vars["tau_min"],
                      max_steps=STEPS, handle_nan=True,
                      accept_growth_min=1.05)

def commit_full(y, ys, f):
    spec = jnp.concatenate([ys, y[2:]], axis=0)
    return jnp.where(f, spec, y)

def commit_none(y, ys, f):
    return y

for name, cf in [("dus", None), ("full", commit_full), ("none", commit_none)]:
    stage_fn = make_fused_stage(geom, prm_s, calc_mode=0)
    if cf is not None:
        stage_fn.commit = cf
    solve = jax.jit(lambda st, s=stage_fn: merson_solve(
        None, st, 1e9, params, stage_fn=s))
    w_dev = pad_state(jnp.asarray(w0, jnp.float32), geom)
    state = merson_init(w_dev, 0.0, 1e-4)
    t0 = time.time()
    state, _ = solve(state)
    n = int(state.steps_total)
    c1 = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        state, _ = solve(state)
        done = int(state.steps_total) - n
        n = int(state.steps_total)
        best = min(best, (time.time() - t0) / done)
    print(f"{name:6s} compile+warm {c1:6.1f}s   best {best*1e3:.3f} "
          f"ms/attempt  (t={float(state.t):.3f}s)", flush=True)
