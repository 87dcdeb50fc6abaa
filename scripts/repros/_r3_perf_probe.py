"""Round-3 probe: pure execution time per Merson attempt on the chip.

Times repeated calls of ONE compiled solve (max_steps baked), so compile
cost is excluded and the per-call dispatch overhead is visible.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", "--no-x64" not in sys.argv)

from porousfreezethaw_tpu.cases import freezing_params_text
from porousfreezethaw_tpu.config import parse_param_file
from porousfreezethaw_tpu.core.grid import GridGeometry
from porousfreezethaw_tpu.models.freezing import (
    FreezingParams, build_glass_field, build_initial_conditions, make_rhs,
    shift_temperature_origin)
from porousfreezethaw_tpu.models.freezing.glass import read_ball_positions
from porousfreezethaw_tpu.solvers.merson import (
    MersonParams, merson_init, merson_solve)
from porousfreezethaw_tpu.ops.pallas.stencil import make_fused_stage, pad_state

GN = 200
STEPS = 100

def log(*a):
    print(*a, flush=True)

t_all = time.time()
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
rhs = make_rhs(geom, prm_s, calc_mode=0)
stage_fn = make_fused_stage(geom, prm_s, calc_mode=0)
log(f"setup {time.time()-t_all:.1f}s; x64={jax.config.read('jax_enable_x64')}")

params = MersonParams(delta=pf.vars["delta"], h_min=pf.vars["tau_min"],
                      max_steps=STEPS, handle_nan=True)
solve = jax.jit(lambda st: merson_solve(rhs, st, 1e9, params,
                                        stage_fn=stage_fn))
w_dev = pad_state(jnp.asarray(w0, jnp.float32), geom)
state = merson_init(w_dev, 0.0, min(pf.vars["tau"], 1e-4))

t0 = time.time()
state, _ = solve(state)
n = int(state.steps_total)   # sync via scalar fetch
log(f"call1 (compile+{STEPS} steps): {time.time()-t0:.1f}s")

for i in range(4):
    t0 = time.time()
    state, _ = solve(state)
    done = int(state.steps_total) - n
    n = int(state.steps_total)
    dt = time.time() - t0
    log(f"call{i+2}: {dt:.3f}s for {done} attempts -> "
        f"{dt/done*1e3:.2f} ms/attempt (t={float(state.t):.6f}, "
        f"h={float(state.h):.3e}, steps={int(state.steps)})")
log(f"total {time.time()-t_all:.1f}s")
