"""Fused Pallas stage kernels on a device mesh.

Composes the single-shard fused stage kernel (``ops/pallas/stencil.py``,
built with ``shard_ghosts=True``) with explicit z-halo exchange under
``shard_map`` — the TPU-native form of the reference's distributed hot
path, where every Merson stage evaluation exchanges one ghost plane with
each z-neighbor inside the RHS (``equation.c:290-326``,
``RK_MPI_SAsolver_hybrid2.c:215``).

Design:

* The state lives in the padded kernel layout ``(3, Z, R, 128)``
  (``pad_state``), sharded over the mesh's z axis.
* Per stage, each shard ppermutes the *raw* edge planes of ``w`` and each
  ``K_i`` one hop up and one hop down the ICI ring — the Isend/Irecv pair
  of ``sync_solution``.  The kernel combines the received planes itself,
  with the same arithmetic it applies to its own slabs, so sharded and
  single-device results agree **bitwise** (pre-combining the planes
  outside the kernel was measured to differ by FMA-contraction ulps).
* The global chain ends substitute the physical BCs: mirror (the shard's
  own edge planes) at z=0; at z=L3 mirror with the Dirichlet value on
  ``w``'s temperature plane and 0 on the ``K`` temperature planes, so the
  combined ghost is exactly the Dirichlet value (``equation.c:113-185``).
* The stage-5 tail returns per-shard eps blocks; the Merson controller's
  ``jnp.max`` over the (sharded) block array becomes the one global
  all-reduce per attempt — the reference's ``MPI_Allreduce(MAX)``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jax import shard_map

from ..core.grid import GridGeometry
from ..models.freezing import physics
from ..models.freezing.parameters import FreezingParams
from ..ops.pallas.stencil import (
    K_VARS, make_delta_g, make_fused_stage, padded_shape)


def padded_sharding(mesh: Mesh, axis_name: str = "z") -> NamedSharding:
    """Sharding of the padded kernel layout (3, Z, R, 128): Z over z."""
    return NamedSharding(mesh, P(None, axis_name, None, None))


def halo_bytes_per_attempt(geom: GridGeometry, layout: str = "flat",
                           dtype_bytes: int = 4) -> int:
    """ICI halo traffic per Merson attempt per device (both directions).

    Each stage ppermutes the raw edge planes of w and every K entering
    its combination — stage K-counts (0, 1, 2, 3, 3) — one plane per
    input per direction: 3 variables for w, 2 (the dynamic u, p; gl is
    static) for each K.  The analytic overlap model:
    with the interior/edge kernel split, this transfer runs concurrently
    with the interior stencil pass, so scaling stays compute-bound while

        halo_time = bytes / ICI_bw  <  interior_time
                  ~ (zl - 2*bz) / zl * per-shard stage time,

    which at MR over 8 shards (zl=25) gives ~34 us of transfer (v5p-class
    ~100 GB/s links) against ~90 us of interior compute — hidden with
    ~2.6x headroom; the >= 80% weak-scaling north star follows as long as
    zl stays >= ~3 z-blocks.  (The reference's unoverlapped exchange is
    its documented bottleneck, include/RK_MPI_SAsolver.h:161-169: 58-69%
    strong-scaling efficiency at 4 nodes.)
    """
    from ..ops.pallas.stencil import flat_extent, padded_extents
    if layout == "flat":
        plane = flat_extent(geom)
    else:
        yp, xp = padded_extents(geom)
        plane = yp * xp
    stage_k = [0, 1, 2, 3, 3]               # K's per stage (w always)
    var_planes = sum(3 + 2 * nk for nk in stage_k)
    return var_planes * 2 * plane * dtype_bytes


def make_sharded_fused_stage(geom: GridGeometry, params: FreezingParams,
                             calc_mode: int, mesh: Mesh,
                             axis_name: str = "z", *, bz: int = 0,
                             layout: str = "flat",
                             interpret: bool = False,
                             overlap: bool = True):
    """Build ``stage(t, h, w, ks) -> K`` (+ ``.stage5``) over the mesh.

    Drop-in replacement for ``make_fused_stage``'s result: identical
    signature and semantics, but ``w``/``K`` are global arrays sharded
    over ``mesh``'s ``axis_name`` and every stage performs the per-stage
    halo exchange over ICI.  Usable directly as ``merson_solve``'s
    ``stage_fn``.

    ``overlap`` splits each shard's kernel into an interior pass (no
    ghost dependency — XLA schedules it concurrently with the ppermute)
    and an edge pass writing the first/last z-blocks into the interior
    pass's donated buffers: the halo transfer hides behind interior
    compute, the reference's known scaling bottleneck
    (include/RK_MPI_SAsolver.h:161-169, SURVEY §5.7).  Disabled in
    interpret mode (no input/output aliasing emulation) — results are
    identical either way, overlap only changes scheduling.
    """
    nz = mesh.shape[axis_name]
    Z = geom.n3
    if Z % nz:
        raise ValueError(f"n3={Z} not divisible by mesh {axis_name}={nz}")
    zl = Z // nz
    if zl < 2:
        raise ValueError(f"shards need >= 2 z planes, have {zl}")
    inner = make_fused_stage(geom, params, calc_mode, bz=bz, layout=layout,
                             interpret=interpret, n3_local=zl,
                             shard_ghosts=True)
    kshape = padded_shape(geom, layout)
    prm = params
    spec = P(None, axis_name, None, None)
    scal = P()
    up = [(i, (i + 1) % nz) for i in range(nz)]     # send toward +z
    down = [(i, (i - 1) % nz) for i in range(nz)]   # send toward -z

    calls = {}

    def build(coefs: tuple, stage5: bool):
        nk = len(coefs)
        eps_spec = P(axis_name, None, None)
        out_specs = (spec, eps_spec) if stage5 else spec
        in_specs = (scal, scal, spec) + (spec,) * nk

        @partial(shard_map, mesh=mesh, in_specs=in_specs,
                 out_specs=out_specs, check_vma=False)
        def impl(t, h, w_l, *k_l):
            idx = lax.axis_index(axis_name)
            tf = jnp.asarray(t, jnp.float32)
            # raw edge planes of every input, stacked (nk+1, 3) + plane:
            # K planes carry only the 2 dynamic variables (gl static) —
            # padded with a zero gl plane to keep the stack uniform (the
            # kernel reads back only the dynamic ones)
            zpl = jnp.zeros_like(w_l[2:3, 0])

            def kpl(k, z):
                return jnp.concatenate([k[:, z], zpl], axis=0)

            lo = jnp.stack([w_l[:, 0]] + [kpl(k, 0) for k in k_l])
            hi = jnp.stack([w_l[:, -1]] + [kpl(k, -1) for k in k_l])
            from_below = lax.ppermute(hi, axis_name, up)
            from_above = lax.ppermute(lo, axis_name, down)

            # physical BCs at the chain ends (equation.c:113-185):
            # mirror (own edge planes) at z=0; at z=L3 mirror with
            # Dirichlet on w's u plane and 0 on the K u planes, making
            # the kernel's combined ghost exactly the Dirichlet value
            inp = lax.broadcasted_iota(jnp.int32, hi.shape, 0)
            var = lax.broadcasted_iota(jnp.int32, hi.shape, 1)
            d_val = physics.dirichlet_top(tf, prm).astype(hi.dtype)
            hi_bc = jnp.where(var == 0,
                              jnp.where(inp == 0, d_val, 0.0), hi)
            ghost_lo = jnp.where(idx == 0, lo, from_below)
            ghost_hi = jnp.where(idx == nz - 1, hi_bc, from_above)

            ks_local = list(zip(coefs, k_l))
            split = (overlap and not interpret
                     and inner.n_blocks(nk) >= 3)
            if split:
                if stage5:
                    prev = inner.interior(t, h, w_l, ks_local, stage5=True)
                    return inner.edge(t, h, w_l, ks_local, ghost_lo,
                                      ghost_hi, prev, stage5=True)
                k_int = inner.interior(t, h, w_l, ks_local)
                return inner.edge(t, h, w_l, ks_local, ghost_lo, ghost_hi,
                                  (k_int,))
            if stage5:
                return inner.stage5(t, h, w_l, ks_local, ghost_lo, ghost_hi)
            return inner(t, h, w_l, ks_local, ghost_lo, ghost_hi)

        return impl

    def _call(t, h, w, ks, stage5):
        if w.shape != kshape:
            raise ValueError(
                f"sharded fused stage expects the padded layout {kshape}, "
                f"got {w.shape}")
        coefs = tuple(c for c, _ in ks)
        key = (coefs, stage5)
        if key not in calls:
            calls[key] = build(coefs, stage5)
        return calls[key](jnp.asarray(t), jnp.asarray(h),
                          w, *[k for _, k in ks])

    def stage(t, h, w, ks):
        return _call(t, h, w, ks, False)

    def stage5(t, h, w, ks):
        if len(ks) != 3:
            raise ValueError("stage5 takes the 3-term K1/K3/K4 combination")
        return _call(t, h, w, ks, True)

    def commit(y, y_spec, flag):
        """Partial-state accepted-step select (see make_fused_stage): an
        elementwise select + static update-slice, GSPMD-partitioned over
        the mesh like the state itself."""
        sel = jnp.where(flag, y_spec, y[:2])
        return lax.dynamic_update_slice(y, sel.astype(y.dtype),
                                        (0,) * y.ndim)

    stage.stage5 = stage5
    stage.commit = commit
    stage.k_partial = True
    return stage


class ShardedDeltaAttempt:
    """The increment-form (delta) Merson attempt over a device mesh.

    Composes the single-shard G kernels (``make_delta_g`` with
    ``shard_ghosts=True``) with the same per-stage raw-edge-plane
    ppermute protocol as ``make_sharded_fused_stage``: each G stage
    exchanges the edge planes of ``w`` and of every K/G entering its
    delta combination ``d = h * sum(c_i K_i)`` with the z-neighbors, and
    the kernel assembles the d-ghost from the raw planes itself — so
    sharded and single-device results agree bitwise.  Stage 1
    (``K1 = f(w)``) reuses the classic sharded fused stage, whose ghost
    contract is identical at nk=0.

    Chain ends: mirror ghosts are each shard's own edge planes; the
    Dirichlet top enters through the kernel's ``is_top``-gated
    overwrites (old u-ghost := D(t1), increment u-ghost := D(ti)-D(t1)
    — the exact ghost contract of models/freezing/delta.py), applied
    only on the global-top shard.

    Implements merson_solve's ``attempt_fn`` protocol; the state is the
    padded 3-variable array sharded over z (``padded_sharding``).  This
    is the distributed form of the production f32 GradP path — the
    reference's halo-in-RHS distributed solve (equation.c:290-326)
    carrying the noise-floor-free numerics (VERDICT r3 §1).
    """

    def __init__(self, geom: GridGeometry, params: FreezingParams,
                 calc_mode: int, mesh: Mesh, axis_name: str = "z", *,
                 bz: int = 0, layout: str = "flat",
                 interpret: bool = False, compensated: bool = False):
        nz = mesh.shape[axis_name]
        Z = geom.n3
        if Z % nz:
            raise ValueError(f"n3={Z} not divisible by mesh {axis_name}={nz}")
        zl = Z // nz
        if zl < 2:
            raise ValueError(f"shards need >= 2 z planes, have {zl}")
        self.geom = geom
        self.layout = layout
        self.kshape = padded_shape(geom, layout)
        # compensated (double-f32) commit: same TwoSum accumulation as
        # stencil.DeltaAttemptComp, with the lo planes riding the mesh
        # under the same z-sharding as the state
        self.compensated = compensated
        self.kshape5 = (self.kshape[0] + K_VARS,) + self.kshape[1:]
        self._prm = params
        self._mesh = mesh
        self._axis = axis_name
        self._nz = nz
        self._stage1 = make_sharded_fused_stage(
            geom, params, calc_mode, mesh, axis_name, bz=bz, layout=layout,
            interpret=interpret)
        self._inner_g = make_delta_g(
            geom, params, calc_mode, bz=bz, layout=layout,
            interpret=interpret, n3_local=zl, shard_ghosts=True)
        self._calls = {}
        self._up = [(i, (i + 1) % nz) for i in range(nz)]
        self._down = [(i, (i - 1) % nz) for i in range(nz)]

    def _g(self, h, D1, dDi, w, ks, stage5=False, emit="y"):
        axis = self._axis
        nz = self._nz
        spec = P(None, axis, None, None)
        scal = P()
        coefs = tuple(c for c, _ in ks)
        key = (coefs, stage5, emit)
        if key not in self._calls:
            nk = len(coefs)
            eps_spec = P(axis, None, None)
            out_specs = (spec, eps_spec) if stage5 else spec
            in_specs = (scal, scal, scal, spec) + (spec,) * nk

            @partial(shard_map, mesh=self._mesh, in_specs=in_specs,
                     out_specs=out_specs, check_vma=False)
            def impl(h_, D1_, dDi_, w_l, *k_l):
                idx = lax.axis_index(axis)
                # raw edge planes of every input, stacked
                # (nk+1, 3) + plane; K/G planes carry the K_VARS dynamic
                # variables, zero-padded to a uniform stack (the kernel
                # reads back only the dynamic ones)
                zpl = jnp.zeros_like(w_l[K_VARS:K_VARS + 1, 0])

                def kpl(k, z):
                    return jnp.concatenate([k[:, z], zpl], axis=0)

                lo = jnp.stack([w_l[:, 0]] + [kpl(k, 0) for k in k_l])
                hi = jnp.stack([w_l[:, -1]] + [kpl(k, -1) for k in k_l])
                from_below = lax.ppermute(hi, axis, self._up)
                from_above = lax.ppermute(lo, axis, self._down)
                # chain ends: mirror = own edge planes; the Dirichlet top
                # is applied by the kernel's is_top-gated overwrites
                ghost_lo = jnp.where(idx == 0, lo, from_below)
                ghost_hi = jnp.where(idx == nz - 1, hi, from_above)
                is_top = (idx == nz - 1).astype(jnp.float32)
                return self._inner_g(h_, D1_, dDi_, w_l,
                                     list(zip(coefs, k_l)),
                                     ghosts=(ghost_lo, ghost_hi),
                                     is_top=is_top, stage5=stage5,
                                     emit=emit)

            self._calls[key] = impl
        return self._calls[key](jnp.asarray(h), jnp.asarray(D1),
                                jnp.asarray(dDi), w, *[k for _, k in ks])

    # --- merson_solve attempt_fn protocol (same as DeltaAttempt) ---

    def pack(self, y):
        if self.compensated:
            if y.shape == self.kshape5:    # merson_solve re-packs
                return y
            if y.shape != self.kshape:
                raise ValueError(
                    f"ShardedDeltaAttempt expects the padded "
                    f"{self.layout!r} layout {self.kshape} (or its "
                    f"packed 5-plane form), got {y.shape}")
            lo = jnp.zeros_like(y[:K_VARS])
            return jnp.concatenate([y, lo], axis=0)
        if y.shape != self.kshape:
            raise ValueError(
                f"ShardedDeltaAttempt expects the padded {self.layout!r} "
                f"layout {self.kshape} (see pad_state), got {y.shape}")
        return y

    def attempt(self, t, h, y):
        prm = self._prm
        nv = self.kshape[0]
        y5 = y if self.compensated else None
        if self.compensated:
            y = y5[:nv]
        D1 = physics.dirichlet_top(t, prm)

        def dD(ts):
            # exact: both values are parameter constants
            return (physics.dirichlet_top(ts, prm) - D1).astype(jnp.float32)

        K1 = self._stage1(t, h, y, [])
        G2 = self._g(h, D1, dD(t + h / 3), y, [(1.0 / 3.0, K1)])
        G3 = self._g(h, D1, dD(t + h / 3), y,
                     [(1.0 / 3.0, K1), (1.0 / 6.0, G2)])
        G4 = self._g(h, D1, dD(t + h / 2), y,
                     [(0.5, K1), (0.375, G3)])
        y_spec, eps_blocks = self._g(
            h, D1, dD(t + h), y,
            [(1.0, K1), (-1.5, G3), (2.0, G4)], stage5=True,
            emit="dy" if self.compensated else "y")
        return ((y5, y_spec) if self.compensated else (y, y_spec),
                eps_blocks)

    def commit(self, carry_spec, accept):
        y, y_spec = carry_spec
        if self.compensated:
            nv = self.kshape[0]
            y_hi, y_lo = y[:K_VARS], y[nv:]
            t1 = y_spec + y_lo                 # y_spec is the bare dy
            s = y_hi + t1
            bb = s - y_hi
            err = (y_hi - (s - bb)) + (t1 - bb)
            new_hi = jnp.where(accept, s, y_hi)
            new_lo = jnp.where(accept, err, y_lo)
            out = lax.dynamic_update_slice(y, new_hi, (0,) * y.ndim)
            return lax.dynamic_update_slice(
                out, new_lo, (nv,) + (0,) * (y.ndim - 1))
        sel = jnp.where(accept, y_spec, y[:K_VARS])
        return lax.dynamic_update_slice(y, sel.astype(y.dtype),
                                        (0,) * y.ndim)

    def unpack(self, y):
        # compensated: lo planes stay in the carried state (strip with
        # y[:3] for output)
        return y


def make_sharded_delta_attempt(geom: GridGeometry, params: FreezingParams,
                               calc_mode: int, mesh: Mesh,
                               axis_name: str = "z", *, bz: int = 0,
                               layout: str = "flat",
                               interpret: bool = False,
                               compensated: bool = False
                               ) -> ShardedDeltaAttempt:
    return ShardedDeltaAttempt(geom, params, calc_mode, mesh, axis_name,
                               bz=bz, layout=layout, interpret=interpret,
                               compensated=compensated)


# ---------------------------------------------------------------------------
# 2-D (z, y) sharding — round 5
# ---------------------------------------------------------------------------

_KG = 8  # ghost lane-rows per side: 8 rows = 1024 cells >= X0 + 128
         # for every grid this framework targets (X0 <= 896)


def padded_rows_2d(geom: GridGeometry, ny: int) -> int:
    """Lane-row count of the 2-D-sharded flat layout: the 1-D flat row
    count rounded up so every y-shard holds the same whole number of
    rows.  The extra rows extend the existing end-of-plane pad (edge-
    replicated, mask-excluded)."""
    from ..ops.pallas.stencil import _LANES, flat_extent
    r = flat_extent(geom) // _LANES
    return -(-r // ny) * ny


def pad_state_2d(w, geom: GridGeometry, ny: int):
    """(nv, Z, Y, X) -> the (nv, Z, R_pad, 128) flat layout whose row
    count divides evenly over ``ny`` y-shards."""
    from ..ops.pallas.stencil import _LANES, pad_state
    flat = pad_state(w, geom, layout="flat")
    rpad = padded_rows_2d(geom, ny)
    extra = rpad - flat.shape[2]
    if extra:
        flat = jnp.pad(flat, ((0, 0), (0, 0), (0, extra), (0, 0)),
                       mode="edge")
    return flat


def padded_sharding_2d(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(None, "z", "y", None))


def unpad_state_2d(w, geom: GridGeometry):
    from ..ops.pallas.stencil import _LANES
    nv = w.shape[0]
    flat = w.reshape(nv, geom.n3, -1)
    return flat[:, :, :geom.n2 * geom.n1].reshape(
        nv, geom.n3, geom.n2, geom.n1)


class ShardedDeltaAttempt2D:
    """The increment-form (delta) Merson attempt over a 2-D (z, y) mesh.

    Extends the 1-D raw-edge-plane protocol (``ShardedDeltaAttempt``)
    with a second sharded dimension the reference cannot decompose at
    all (``intertrack.c:1780-1789`` is 1-D-only): the flat layout's
    lane-row axis is split over the ``y`` mesh axis, and each stage

    1. exchanges ``_KG`` raw edge lane-rows with both y-neighbors
       (``ppermute`` over the y ring) and concatenates them around the
       local rows — the slab then covers every in-plane neighbor any
       own-row cell can reach (x/y shifts span < _KG*128 cells);
    2. exchanges raw edge z-planes of the y-EXTENDED arrays with both
       z-neighbors exactly like the 1-D protocol (the extended planes
       carry the corner rows for free, though the 7-point stencil never
       reads them);
    3. runs the same G kernels with a global row-offset scalar — the
       kernels' x/y mirror masks decode global coordinates, so domain
       edges behave identically on any mesh, and chain-end ghost-row
       content (ring wrap) is provably never consumed;
    4. slices the ghost rows off the outputs (``row_window`` already
       excludes them from the stage-5 error max — duplicated valid rows
       would not change a max, invalid wrapped rows would).

    Bitwise identical to the single-device ``DeltaAttempt`` by the same
    argument as the 1-D protocol: ghost values equal the rows/planes the
    single-device kernel addresses itself, and every combination is the
    kernel's own arithmetic.  State: ``(3, Z, R_pad, 128)`` where
    ``R_pad`` = ``padded_rows_2d`` (``pad_state_2d`` builds it), sharded
    ``P(None, "z", "y", None)``.
    """

    def __init__(self, geom: GridGeometry, params: FreezingParams,
                 calc_mode: int, mesh: Mesh, *, bz: int = 0,
                 interpret: bool = False):
        from ..ops.pallas.stencil import (
            _LANES, K_VARS as _KV, N_VARS as _NV, make_delta_g,
            make_fused_stage)
        if set(mesh.axis_names) != {"z", "y"}:
            raise ValueError(
                f"ShardedDeltaAttempt2D needs mesh axes z and y, got "
                f"{mesh.axis_names}")
        nz = mesh.shape["z"]
        ny = mesh.shape["y"]
        Z = geom.n3
        if Z % nz:
            raise ValueError(f"n3={Z} not divisible by mesh z={nz}")
        zl = Z // nz
        if zl < 2:
            raise ValueError(f"z-shards need >= 2 planes, have {zl}")
        rpad = padded_rows_2d(geom, ny)
        rl = rpad // ny
        if rl < _KG:
            raise ValueError(
                f"y-shards need >= {_KG} lane rows, have {rl} "
                f"(grid too small for y={ny})")
        if geom.n1 + _LANES > _KG * _LANES:
            raise ValueError(
                f"n1={geom.n1} exceeds the {_KG}-row ghost reach")
        self.geom = geom
        self.layout = "flat"
        self.kshape = (_NV, Z, rpad, _LANES)
        self._prm = params
        self._mesh = mesh
        self._nz, self._ny = nz, ny
        self._zl, self._rl = zl, rl
        self._kv, self._nv = _KV, _NV
        r_ext = rl + 2 * _KG
        self._stage1 = make_fused_stage(
            geom, params, calc_mode, bz=bz, layout="flat",
            interpret=interpret, n3_local=zl, shard_ghosts=True,
            plane_rows=r_ext, row_window=(_KG, _KG + rl))
        self._inner_g = make_delta_g(
            geom, params, calc_mode, bz=bz, layout="flat",
            interpret=interpret, n3_local=zl, shard_ghosts=True,
            plane_rows=r_ext, row_window=(_KG, _KG + rl))
        self._calls = {}
        self._up_z = [(i, (i + 1) % nz) for i in range(nz)]
        self._down_z = [(i, (i - 1) % nz) for i in range(nz)]
        self._up_y = [(i, (i + 1) % ny) for i in range(ny)]
        self._down_y = [(i, (i - 1) % ny) for i in range(ny)]

    # -- shared shard_map body pieces ------------------------------------

    def _extend_y(self, arr):
        """(nv, zl, rl, 128) -> (nv, zl, rl + 2*_KG, 128) with raw edge
        row-blocks from the y-ring neighbors (chain-end content is
        wrap — provably unused, see class docstring)."""
        lo = arr[:, :, :_KG]
        hi = arr[:, :, self._rl - _KG:]
        from_below = lax.ppermute(hi, "y", self._up_y)
        from_above = lax.ppermute(lo, "y", self._down_y)
        return jnp.concatenate([from_below, arr, from_above], axis=2)

    def _z_ghosts(self, w_e, k_es, dirichlet_t=None):
        """Raw edge z-planes of the y-extended arrays, ppermuted over
        the z ring; chain ends mirror (own planes).  ``dirichlet_t``
        (classic stage-1 only): at the global top, the w-ghost u plane
        is D(t) and the K ghost u planes are 0, making the kernel's
        combined ghost exactly the Dirichlet value."""
        zi = lax.axis_index("z")
        zpl = jnp.zeros_like(w_e[self._kv:self._kv + 1, 0])

        def kpl(k, z):
            return jnp.concatenate([k[:, z], zpl], axis=0)

        lo = jnp.stack([w_e[:, 0]] + [kpl(k, 0) for k in k_es])
        hi = jnp.stack([w_e[:, -1]] + [kpl(k, -1) for k in k_es])
        from_below = lax.ppermute(hi, "z", self._up_z)
        from_above = lax.ppermute(lo, "z", self._down_z)
        if dirichlet_t is not None:
            inp = lax.broadcasted_iota(jnp.int32, hi.shape, 0)
            var = lax.broadcasted_iota(jnp.int32, hi.shape, 1)
            d_val = physics.dirichlet_top(
                jnp.asarray(dirichlet_t, jnp.float32),
                self._prm).astype(hi.dtype)
            hi = jnp.where(var == 0,
                           jnp.where(inp == 0, d_val, 0.0), hi)
        ghost_lo = jnp.where(zi == 0, lo, from_below)
        ghost_hi = jnp.where(zi == self._nz - 1, hi, from_above)
        return ghost_lo, ghost_hi

    def _row0(self):
        return (lax.axis_index("y") * self._rl - _KG).astype(jnp.int32)

    def _g(self, h, D1, dDi, w, ks, stage5=False):
        spec = P(None, "z", "y", None)
        scal = P()
        coefs = tuple(c for c, _ in ks)
        key = ("g", coefs, stage5)
        if key not in self._calls:
            nk = len(coefs)
            eps_spec = P(("z", "y"), None, None)
            out_specs = (spec, eps_spec) if stage5 else spec
            in_specs = (scal, scal, scal, spec) + (spec,) * nk

            @partial(shard_map, mesh=self._mesh, in_specs=in_specs,
                     out_specs=out_specs, check_vma=False)
            def impl(h_, D1_, dDi_, w_l, *k_l):
                w_e = self._extend_y(w_l)
                k_es = [self._extend_y(k) for k in k_l]
                ghost_lo, ghost_hi = self._z_ghosts(w_e, k_es)
                is_top = (lax.axis_index("z") == self._nz - 1
                          ).astype(jnp.float32)
                out = self._inner_g(h_, D1_, dDi_, w_e,
                                    list(zip(coefs, k_es)),
                                    ghosts=(ghost_lo, ghost_hi),
                                    is_top=is_top, stage5=stage5,
                                    row0=self._row0())
                cut = lambda a: a[:, :, _KG:_KG + self._rl]
                if stage5:
                    y_spec_e, eps = out
                    return cut(y_spec_e), eps
                return cut(out)

            self._calls[key] = impl
        return self._calls[key](jnp.asarray(h), jnp.asarray(D1),
                                jnp.asarray(dDi), w, *[k for _, k in ks])

    def _k1(self, t, h, w):
        key = ("k1",)
        if key not in self._calls:
            spec = P(None, "z", "y", None)

            @partial(shard_map, mesh=self._mesh,
                     in_specs=(P(), P(), spec), out_specs=spec,
                     check_vma=False)
            def impl(t_, h_, w_l):
                w_e = self._extend_y(w_l)
                ghost_lo, ghost_hi = self._z_ghosts(
                    w_e, [], dirichlet_t=t_)
                out = self._stage1(t_, h_, w_e, [], ghost_lo, ghost_hi,
                                   row0=self._row0())
                return out[:, :, _KG:_KG + self._rl]

            self._calls[key] = impl
        return self._calls[key](jnp.asarray(t), jnp.asarray(h), w)

    # --- merson_solve attempt_fn protocol (same as DeltaAttempt) ---

    def pack(self, y):
        if y.shape != self.kshape:
            raise ValueError(
                f"ShardedDeltaAttempt2D expects the 2-D padded flat "
                f"layout {self.kshape} (see pad_state_2d), got {y.shape}")
        return y

    def attempt(self, t, h, y):
        prm = self._prm
        D1 = physics.dirichlet_top(t, prm)

        def dD(ts):
            return (physics.dirichlet_top(ts, prm) - D1).astype(jnp.float32)

        K1 = self._k1(t, h, y)
        G2 = self._g(h, D1, dD(t + h / 3), y, [(1.0 / 3.0, K1)])
        G3 = self._g(h, D1, dD(t + h / 3), y,
                     [(1.0 / 3.0, K1), (1.0 / 6.0, G2)])
        G4 = self._g(h, D1, dD(t + h / 2), y,
                     [(0.5, K1), (0.375, G3)])
        y_spec, eps_blocks = self._g(
            h, D1, dD(t + h), y,
            [(1.0, K1), (-1.5, G3), (2.0, G4)], stage5=True)
        return (y, y_spec), eps_blocks

    def commit(self, carry_spec, accept):
        y, y_spec = carry_spec
        sel = jnp.where(accept, y_spec, y[:K_VARS])
        return lax.dynamic_update_slice(y, sel.astype(y.dtype),
                                        (0,) * y.ndim)

    def unpack(self, y):
        return y
