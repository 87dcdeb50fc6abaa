"""Round-5 A/B: does a compensated (double-f32) state commit remove the
residual f32 delta-path step inflation?

Starts from a SMOOTH f64 checkpoint of the LR GradP golden run (the
round-4 f64 run matches the reference 1.0005x, so its states are the
reference trajectory for practical purposes), rounds it to the f32
production storage, and integrates one (or more) snapshot intervals
three ways on CPU:

  f64   : XlaDeltaAttempt on the f64 state     -> oracle step count
  f32   : XlaDeltaAttempt on the f32 state     -> production behavior
  f32c  : XlaDeltaAttemptComp (compensated commit)

All use the exact reference step rule.  If f32 inflates vs f64 over the
segment and f32c does not, the commit-rounding accumulation is the
driver and the compensation is the fix worth porting into the Pallas
delta kernels; if f32 == f64 here, the published inflation is inherited
from the early trajectory instead.

Usage: python scripts/repros/_r5_commit_compensation_ab.py \
           /tmp/golden_r4/LR-f64/freeze-thaw-10h-GradP/image.025.ncd \
           [n_intervals] [f64|f32|f32c ...]
"""
import sys
import time

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from porousfreezethaw_tpu.cases import freezing_params_text
from porousfreezethaw_tpu.config import parse_param_file
from porousfreezethaw_tpu.core.grid import GridGeometry
from porousfreezethaw_tpu.io.netcdf3 import read_netcdf
from porousfreezethaw_tpu.models.freezing import FreezingParams
from porousfreezethaw_tpu.models.freezing.delta import (
    XlaDeltaAttempt, XlaDeltaAttemptComp)
from porousfreezethaw_tpu.models.freezing.parameters import (
    shift_temperature_origin)
from porousfreezethaw_tpu.solvers.merson import (
    MersonParams, merson_init, merson_solve)

path = sys.argv[1]
n_iv = int(sys.argv[2]) if len(sys.argv) > 2 else 1
configs = sys.argv[3:] or ["f64", "f32", "f32c"]
data = read_netcdf(path)
u = np.asarray(data.variables["u"], np.float64)
p = np.asarray(data.variables["p"], np.float64)
gl = np.asarray(data.variables["gl"], np.float64)
t0 = float(data.attrs["t"])
tau = float(data.attrs["tau"])
final_time = float(data.attrs["final_time"])
total_snapshots = int(data.attrs["total_snapshots"])
n3, n2, n1 = u.shape
iv = final_time / (total_snapshots - 1)
t_end = t0 + n_iv * iv
print(f"LR f64 checkpoint t={t0:.1f}s tau={tau:.4e}; integrating "
      f"{n_iv} interval(s) to t={t_end:.1f}s", flush=True)

# params from the checkpoint's OWN attrs — cases.py's generator is the
# bench case, which differs from the shipped Params (xi_gl); the golden
# runs use the shipped file, so the A/B must too
prm0 = FreezingParams.from_dict(data.attrs)
geom = GridGeometry(data.attrs["L1"], data.attrs["L2"], data.attrs["L3"],
                    n1, n2, n3)
prm = shift_temperature_origin(prm0, prm0.u_star)
delta = float(data.attrs["delta"])

# the f32 production storage of this state
w32 = np.stack([(u - prm0.u_star).astype(np.float32),
                p.astype(np.float32), gl.astype(np.float32)])

class _Bf16PhaseAttempt(XlaDeltaAttempt):
    """f32 attempt whose committed p is quantized through bf16 — the
    VERDICT r4 #7 storage experiment (p/gl in bf16, f32 compute),
    measured at the controller level: the step-count impact bounds any
    kernel implementation of bf16 phase storage from below."""

    def commit(self, carry_spec, accept):
        y = super().commit(carry_spec, accept)
        pq = y[1].astype(jnp.bfloat16).astype(y.dtype)
        return y.at[1].set(pq)


for name in configs:
    if name == "f64":
        att = XlaDeltaAttempt(geom, prm, calc_mode=0)
        w = jnp.asarray(np.stack([u - prm0.u_star, p, gl]))
    elif name == "f32":
        att = XlaDeltaAttempt(geom, prm, calc_mode=0)
        w = jnp.asarray(w32)
    elif name == "bf16p":
        att = _Bf16PhaseAttempt(geom, prm, calc_mode=0)
        w = jnp.asarray(w32)
        w = w.at[1].set(w[1].astype(jnp.bfloat16).astype(w.dtype))
        w = w.at[2].set(w[2].astype(jnp.bfloat16).astype(w.dtype))
    else:
        att = XlaDeltaAttemptComp(geom, prm, calc_mode=0)
        w = jnp.asarray(w32)
    chunk = 2000
    params = MersonParams(delta=delta, h_min=1e-6, max_steps=chunk)
    st = merson_init(att.pack(w), t0, tau)
    solve = jax.jit(lambda s, a=att, pa=params: merson_solve(
        lambda *x: None, s, t_end, pa, attempt_fn=a))
    tick = time.time()
    while True:
        st, status = solve(st)
        if int(status) != -7:    # MAX_STEPS
            break
        print(f"  [{name}] ... t={float(st.t):.1f} steps={int(st.steps)} "
              f"({time.time()-tick:.0f}s wall)", flush=True)
    print(f"[{name}] DONE steps={int(st.steps)} attempts="
          f"{int(st.steps_total)} h_end={float(st.h):.4e} "
          f"wall={time.time()-tick:.0f}s", flush=True)
