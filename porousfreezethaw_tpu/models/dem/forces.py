"""Vectorized DEM soft-contact force kernels.

The reference computes per-particle accelerations with an O(n^2) pair scan
under OpenMP (``spheres_friction_angular.c:242-357``).  The TPU-native form
is a masked dense (n x n) pairwise computation — exact for the reference's
n = 200 workloads and a natural fit for the VPU; a cell-list/neighbor-hash
variant for large n lives in ``ops`` (planned; the masked form is the
correctness oracle for it).

Force model (constants in :class:`..config.DEMConfig`):
* collision factor  CF = cfm * exp(-cfe * surf_dist)  (exp model,
  spheres_basic.c:202-207) or the Walton–Braun spring
  ``CF = -k * surf_dist`` for overlap only (spheres_basic_WB.c:207-209)
* velocity-dependent rebound factor  COR^2..1 via tanh
  (spheres_basic.c:192-200)
* tangential friction  FF = CF * mu_f * S(|v_t|)  with the S-shape
  low-velocity limiter (spheres_friction.c:230-240)
* rotation: surface velocity omega x r added to the tangential velocity,
  torque tau = r*FF/I applied to angular acceleration
  (spheres_friction_angular.c:298-321, 339-354)

State pytree: {'pos': (n,3), 'vel': (n,3)[, 'angvel': (n,3)]}.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .config import DEMConfig


def _cross(a, b):
    return jnp.cross(a, b)


def make_dem_rhs(cfg: DEMConfig, dtype=jnp.float64):
    """Build ``rhs(t, y) -> dy/dt`` for the configured variant."""
    P_w, n_w = cfg.wall_arrays()
    kin_energy_fraction = cfg.COR * cfg.COR
    two_r = 2.0 * cfg.r
    eps2_3 = 3.0 / (cfg.p_eps1 * cfg.p_eps1)
    eps3_2 = 2.0 / (cfg.p_eps1 * cfg.p_eps1 * cfg.p_eps1)

    def rebound(v):
        # smooth restitution: ~1 for v>0, ~COR^2 for v<0 (spheres_basic.c:192)
        return kin_energy_fraction + 0.5 * (1.0 - kin_energy_fraction) * (
            1.0 + jnp.tanh(v * cfg.dissipation_focusing))

    if cfg.variant == "basic_WB":
        def collision_factor(surf):
            return jnp.where(surf > 0, 0.0, -cfg.WB_stiffness * surf)
    else:
        def collision_factor(surf):
            return cfg.collision_force_multiplier * jnp.exp(
                -cfg.collision_force_exponent * surf)

    def friction_factor(x):
        lim = x * x * (eps2_3 - eps3_2 * x)
        return jnp.where(x >= cfg.p_eps1, 1.0, lim)

    gravity = jnp.asarray(cfg.gravity, dtype)
    walls_P = jnp.asarray(P_w, dtype)
    walls_n = jnp.asarray(n_w, dtype)

    def rhs(t, y: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        pos, vel = y["pos"], y["vel"]
        angvel = y.get("angvel")
        n = pos.shape[0]

        # ---- particle pairs (masked dense) ----
        dp = pos[:, None, :] - pos[None, :, :]          # i w.r.t. j
        dist = jnp.linalg.norm(dp, axis=-1) + cfg.zero
        mp = dp / dist[..., None]
        surf = dist - two_r
        eye = jnp.eye(n, dtype=bool)
        mask = (~eye) & (surf <= cfg.max_surf_dist)
        CF = jnp.where(mask, collision_factor(surf), 0.0)

        mv = vel[:, None, :] - vel[None, :, :]
        heading = jnp.sum(mv * mp, axis=-1)
        acc = gravity + jnp.sum(
            (CF * rebound(-heading))[..., None] * mp, axis=1)

        angacc = None
        if cfg.has_friction:
            mv_t = mv - heading[..., None] * mp
            if angvel is not None:
                # mp points opposite to r (center -> contact point):
                # v_surf contribution is -r * (omega_i + omega_j) x mp
                sv = _cross(angvel[:, None, :] + angvel[None, :, :], mp)
                mv_t = mv_t - cfg.r * sv
            mvt_mag = jnp.linalg.norm(mv_t, axis=-1) + cfg.zero
            tdir = mv_t / mvt_mag[..., None]
            FF = CF * cfg.friction * friction_factor(mvt_mag)
            acc = acc - jnp.sum(FF[..., None] * tdir, axis=1)
            if angvel is not None:
                torque = _cross(mp, tdir)
                angacc = jnp.sum(
                    (cfg.r * FF / cfg.inertia)[..., None] * torque, axis=1)

        # ---- walls ----
        rel = pos[:, None, :] - walls_P[None, :, :]     # (n, walls, 3)
        wsurf = -jnp.sum(rel * walls_n[None, :, :], axis=-1) - cfg.r
        wmask = wsurf <= cfg.max_surf_dist
        WCF = jnp.where(wmask, collision_factor(wsurf), 0.0)
        wheading = jnp.sum(vel[:, None, :] * walls_n[None, :, :], axis=-1)
        acc = acc - jnp.sum(
            (WCF * rebound(wheading))[..., None] * walls_n[None, :, :], axis=1)

        if cfg.has_friction:
            wv_t = vel[:, None, :] - wheading[..., None] * walls_n[None, :, :]
            if angvel is not None:
                # wall normal points the SAME way as r here: +r * omega x n
                wsv = _cross(angvel[:, None, :],
                             jnp.broadcast_to(walls_n[None, :, :],
                                              (pos.shape[0],) + walls_n.shape))
                wv_t = wv_t + cfg.r * wsv
            wvt_mag = jnp.linalg.norm(wv_t, axis=-1) + cfg.zero
            wtdir = wv_t / wvt_mag[..., None]
            WFF = WCF * cfg.friction * friction_factor(wvt_mag)
            acc = acc - jnp.sum(WFF[..., None] * wtdir, axis=1)
            if angvel is not None:
                wtorque = _cross(jnp.broadcast_to(
                    walls_n[None, :, :],
                    (pos.shape[0],) + walls_n.shape), wtdir)
                angacc = angacc - jnp.sum(
                    (cfg.r * WFF / cfg.inertia)[..., None] * wtorque, axis=1)

        out = {"pos": vel, "vel": acc}
        if angvel is not None:
            out["angvel"] = angacc if angacc is not None else jnp.zeros_like(angvel)
        return out

    return rhs
