"""Pallas fused Merson-stage + stencil kernel for the freezing models.

The hot path of the simulator is the 5-stage Merson attempt: for each stage
``K_s = f(t_s, w + h * sum(c_i K_i))`` the XLA composition materializes the
stage combination and every neighbor shift in HBM (measured ~1.1 ms per
stage at the MR grid vs a ~0.15 ms memory floor on one v5e chip).  This
kernel fuses the stage combination, boundary conditions, and the 7-point
FVM stencil (equation.c:566-884) into one pass:

* the grid is processed in z-slabs of ``bz`` planes; each program DMAs its
  slab plus one halo plane on each side from HBM into VMEM for ``w`` and
  every needed ``K_i`` — this is the VMEM-resident working set,
* the z halo-plane index is **clamped** at the domain edges, which
  realizes the FVM mirror boundary for free (first phantom node = adjacent
  interior node, equation.c:187-199); the Dirichlet top for the
  temperature overwrites the last ghost plane (aux ghost = D exactly,
  because K ghosts enter the combination linearly and the clamped K plane
  is replaced together with w's),
* x/y mirrors are applied in-register on the VMEM block,
* the stage combination ``aux = w + h * sum(c_i K_i)`` and the full
  right-hand side (models 0/1/2 and the frozen-temperature variants) are
  computed without touching HBM again; only ``K_out`` is written back.

float32 only — TPUs have no native f64; the f64 validation path uses the
XLA stencil in equation.py.  Formulas come from the shared
``models/freezing/physics.py`` so both paths agree to rounding.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.grid import GridGeometry
from ...models.freezing import physics
from ...models.freezing.equation import CalcMode
from ...models.freezing.parameters import FreezingParams


def fused_stage_available(dtype) -> bool:
    return jnp.dtype(dtype) == jnp.float32


def padded_extents(geom: GridGeometry) -> Tuple[int, int]:
    """(Yp, Xp): the TPU-tiling-aligned in-plane extents.  Mosaic DMA
    slices must be lane(128)/sublane(8)-aligned, so the fused path runs on
    a padded layout; K is zeroed in the pad region and the state pad cells
    are edge-replicated (inert for physics and for the error max)."""
    return ((geom.n2 + 7) // 8 * 8, (geom.n1 + 127) // 128 * 128)


def pad_state(w: jax.Array, geom: GridGeometry) -> jax.Array:
    """(3, Z, Y, X) -> (3, Z, Yp, Xp), edge-replicated pad."""
    Yp, Xp = padded_extents(geom)
    return jnp.pad(w, ((0, 0), (0, 0), (0, Yp - geom.n2), (0, Xp - geom.n1)),
                   mode="edge")


def unpad_state(w: jax.Array, geom: GridGeometry) -> jax.Array:
    return w[:, :, :geom.n2, :geom.n1]


def _pick_bz(geom: GridGeometry, n_inputs: int, vmem_budget=12 * 2**20) -> int:
    """Largest z-slab whose VMEM working set fits the budget."""
    Yp, Xp = padded_extents(geom)
    plane_bytes = 3 * Yp * Xp * 4
    # inputs (bz+2 planes each) + aux + out (~bz planes each)
    for bz in (16, 8, 4, 2, 1):
        if geom.n3 % bz:
            continue
        total = (n_inputs * (bz + 2) + 2 * bz) * plane_bytes
        if total <= vmem_budget:
            return bz
    return 1


def make_fused_stage(geom: GridGeometry, params: FreezingParams,
                     calc_mode: int, *, bz: int = 0, interpret: bool = False):
    """Build ``stage(t_stage, h, w, ks) -> K`` where ``ks`` is a list of
    ``(coef, K_i)`` pairs entering the combination ``w + h*sum(c_i K_i)``.

    One pallas_call per distinct ``len(ks)`` (the Merson stages use 0-3
    prior K's); coefficients are runtime scalars so all stages with the
    same arity share a compiled kernel.
    """
    mode = CalcMode(calc_mode)
    prm = params
    coeffs = physics.Coeffs.of(prm)
    Z = geom.n3
    Y0, X0 = geom.n2, geom.n1          # true extents
    Yp, Xp = padded_extents(geom)      # tiling-aligned array extents
    inv_h1, inv_h2, inv_h3 = geom.inv_h
    h1_2, h2_2, h3_2 = inv_h1**2, inv_h2**2, inv_h3**2
    h1d2, h2d2, h3d2 = 0.5 * inv_h1, 0.5 * inv_h2, 0.5 * inv_h3

    def shift(f, axis, d):
        """In-block neighbor with mirror at the TRUE x/y edges (pad cells
        are masked out of the output).  f: (bz(+2), Yp, Xp); axis 1=y, 2=x."""
        true_n = Y0 if axis == 1 else X0
        s = jnp.roll(f, -d, axis)
        idx = lax.broadcasted_iota(jnp.int32, f.shape, axis)
        edge = idx == (true_n - 1 if d > 0 else 0)
        return jnp.where(edge, f, s)

    def rhs_block(aux, t, last_block):
        """aux: (3, bz+2, Y, X) with valid z-ghost planes.  Returns
        (3, bz, Y, X) time derivatives for the interior planes."""
        bz_ = aux.shape[1] - 2
        C = slice(1, bz_ + 1)

        u, p, gl = aux[0], aux[1], aux[2]       # (bz+2, Y, X)
        # in-plane neighbors (mirror at global edges)
        uxm, uxp = shift(u, 2, -1), shift(u, 2, +1)
        uym, uyp = shift(u, 1, -1), shift(u, 1, +1)
        pxm, pxp = shift(p, 2, -1), shift(p, 2, +1)
        pym, pyp = shift(p, 1, -1), shift(p, 1, +1)
        gxm, gxp = shift(gl, 2, -1), shift(gl, 2, +1)
        gym, gyp = shift(gl, 1, -1), shift(gl, 1, +1)

        uc, pc, glc = u[C], p[C], gl[C]
        uzm, uzp = u[0:bz_], u[2:bz_ + 2]
        pzm, pzp = p[0:bz_], p[2:bz_ + 2]
        gzm, gzp = gl[0:bz_], gl[2:bz_ + 2]

        lam = lambda pp, gg: physics.lam(pp, gg, prm)
        wind = physics.water_indicator(glc, prm)

        def div_lam_grad_u():
            out = h1_2 * (
                lam(0.5 * (pxm[C] + pc), 0.5 * (gxm[C] + glc)) * (uxm[C] - uc)
                + lam(0.5 * (pxp[C] + pc), 0.5 * (gxp[C] + glc)) * (uxp[C] - uc))
            out += h2_2 * (
                lam(0.5 * (pym[C] + pc), 0.5 * (gym[C] + glc)) * (uym[C] - uc)
                + lam(0.5 * (pyp[C] + pc), 0.5 * (gyp[C] + glc)) * (uyp[C] - uc))
            out += h3_2 * (
                lam(0.5 * (pzm + pc), 0.5 * (gzm + glc)) * (uzm - uc)
                + lam(0.5 * (pzp + pc), 0.5 * (gzp + glc)) * (uzp - uc))
            return out

        if mode == CalcMode.TEMP:
            dp_du = physics.dphf_du(uc, prm) * wind
            denom = physics.rho(pc, glc, prm) * (
                physics.cp(pc, glc, prm) - prm.L * dp_du)
            du = div_lam_grad_u() / denom
            dp = dp_du * du
        else:
            dp = (h1_2 * (pxm[C] + pxp[C] - 2.0 * pc)
                  + h2_2 * (pym[C] + pyp[C] - 2.0 * pc)
                  + h3_2 * (pzm + pzp - 2.0 * pc))
            if mode in (CalcMode.GRADP, CalcMode.GRADP_FROZEN_U):
                gn = jnp.sqrt(
                    (h1d2 * (pxp[C] - pxm[C])) ** 2
                    + (h2d2 * (pyp[C] - pym[C])) ** 2
                    + (h3d2 * (pzp - pzm)) ** 2) + physics.EPS_REGULARIZATION
                dp += physics.f_gradp(uc, pc, gn, prm, coeffs)
            else:
                dp += physics.f_sigmap1_p(uc, pc, prm, coeffs)
            dp = dp / prm.alpha * wind
            if mode in (CalcMode.GRADP_FROZEN_U, CalcMode.SIGMAP_FROZEN_U):
                du = jnp.zeros_like(uc)
            else:
                du = (div_lam_grad_u() / physics.rho(pc, glc, prm)
                      + prm.L * dp) / physics.cp(pc, glc, prm)

        # zero the pad region so K never pollutes the error max or update
        yi = lax.broadcasted_iota(jnp.int32, du.shape, 1)
        xi = lax.broadcasted_iota(jnp.int32, du.shape, 2)
        valid = (yi < Y0) & (xi < X0)
        zero = jnp.zeros_like(du)
        return jnp.stack([jnp.where(valid, du, zero),
                          jnp.where(valid, dp, zero), zero])

    def build_call(nk: int, bz_: int):
        nb = Z // bz_

        def kernel(scal_ref, *refs):
            # refs: nk+1 HBM inputs, out_ref, nk+1 VMEM scratches, sems
            ins = refs[:nk + 1]
            out_ref = refs[nk + 1]
            scratch = refs[nk + 2:nk + 3 + nk]
            sems = refs[-1]
            i = pl.program_id(0)

            copies = []
            for a, (hbm, vm) in enumerate(zip(ins, scratch)):
                # main slab -> scratch planes [1, bz+1)
                copies.append(pltpu.make_async_copy(
                    hbm.at[:, pl.ds(i * bz_, bz_)],
                    vm.at[:, pl.ds(1, bz_)], sems.at[3 * a]))
                # halo planes, index clamped at the domain edge = FVM mirror
                prev = jnp.maximum(i * bz_ - 1, 0)
                copies.append(pltpu.make_async_copy(
                    hbm.at[:, pl.ds(prev, 1)],
                    vm.at[:, pl.ds(0, 1)], sems.at[3 * a + 1]))
                nxt = jnp.minimum(i * bz_ + bz_, Z - 1)
                copies.append(pltpu.make_async_copy(
                    hbm.at[:, pl.ds(nxt, 1)],
                    vm.at[:, pl.ds(bz_ + 1, 1)], sems.at[3 * a + 2]))
            for c in copies:
                c.start()
            for c in copies:
                c.wait()

            t = scal_ref[0, 0]
            h = scal_ref[0, 1]
            aux = scratch[0][:]
            for a in range(nk):
                c = scal_ref[0, 2 + a]
                aux = aux + (h * c) * scratch[1 + a][:]

            # Dirichlet top BC on u: the last ghost plane of the combined
            # stage state is exactly the boundary value (equation.c:113-185)
            last = i == nb - 1
            plane = lax.broadcasted_iota(jnp.int32, aux.shape, 1)
            var = lax.broadcasted_iota(jnp.int32, aux.shape, 0)
            D = physics.dirichlet_top(t, prm).astype(aux.dtype)
            aux = jnp.where(last & (plane == bz_ + 1) & (var == 0), D, aux)

            out_ref[:] = rhs_block(aux, t, last).astype(out_ref.dtype)

        shape = (3, Z, Yp, Xp)
        return pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.ANY)] * (nk + 1),
            out_specs=pl.BlockSpec((3, bz_, Yp, Xp), lambda i: (0, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            scratch_shapes=[pltpu.VMEM((3, bz_ + 2, Yp, Xp), jnp.float32)
                            for _ in range(nk + 1)]
            + [pltpu.SemaphoreType.DMA((3 * (nk + 1),))],
            interpret=interpret,
        )

    calls = {}

    def stage(t_stage, h, w, ks: Sequence[Tuple[float, jax.Array]]):
        nk = len(ks)
        if w.shape != (3, Z, Yp, Xp):
            raise ValueError(
                f"fused stage expects the padded layout (3, {Z}, {Yp}, {Xp}) "
                f"(see pad_state), got {w.shape}")
        bz_ = bz or _pick_bz(geom, nk + 1)
        if (nk, bz_) not in calls:
            calls[(nk, bz_)] = build_call(nk, bz_)
        scal = jnp.concatenate([
            jnp.reshape(jnp.asarray(t_stage, jnp.float32), (1,)),
            jnp.reshape(jnp.asarray(h, jnp.float32), (1,)),
            jnp.asarray([c for c, _ in ks], jnp.float32).reshape(nk),
        ]).reshape(1, nk + 2)
        return calls[(nk, bz_)](scal, w, *[k for _, k in ks])

    return stage
