"""2-D (z, y) sharded increment-form attempt (parallel/fused.py).

The reference's decomposition is 1-D-only (intertrack.c:1780-1789); the
2-D protocol extends the raw-edge exchange with ghost lane-row blocks
over the y ring and global row-offset decoding in the kernels.

Contract (round 5):
* BITWISE mesh-shape invariance within the 2-D family — any (z, y)
  mesh, including the degenerate y=1, produces identical bits (the
  rank-invariance oracle of SURVEY §4.2 extended to a decomposition
  the reference cannot do);
* agreement with the single-device production kernel to FMA-contraction
  ulps (~1e-5 relative): the 2-D kernels' mirror masks are traced
  (global row offset is shard-dependent), the single-device kernels'
  are compile-time constants, and XLA contracts the two program forms
  differently — measured, not a logic difference (the same kernel run
  with a traced offset of 0 on identical inputs shows the same ulps);
* identical SOLVER behavior in practice: a multi-step integration takes
  the same accepted/total step counts as the single-device path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from porousfreezethaw_tpu.core.grid import GridGeometry
from porousfreezethaw_tpu.ops.pallas.stencil import (
    DeltaAttempt, pad_state, unpad_state)
from porousfreezethaw_tpu.parallel.fused import (
    ShardedDeltaAttempt2D, pad_state_2d, padded_sharding_2d,
    unpad_state_2d)
from porousfreezethaw_tpu.parallel.sharding import make_mesh
from porousfreezethaw_tpu.solvers.merson import (
    MersonParams, merson_init, merson_solve)
from tests.test_freezing_equation import default_params


@pytest.fixture(scope="module")
def case():
    # 64x50x8: flat plane = 3200 cells -> 32 lane rows, divisible into
    # 1, 2 or 4 y-shards of >= 8 rows each
    geom = GridGeometry(0.03, 0.03, 0.06, 64, 50, 8)
    prm = default_params()
    rng = np.random.RandomState(7)
    w = jnp.asarray(np.stack([
        273.15 + 10 * (rng.random_sample(geom.shape) - 0.5),
        rng.random_sample(geom.shape),
        rng.random_sample(geom.shape) * 0.6]), jnp.float32)
    return geom, prm, w


MESHES_2D = ["z2,y1", "z2,y2", "z2,y4", "z4,y2"]


def _attempt_2d(geom, prm, calc_mode, w, mesh_spec, t, h):
    mesh = make_mesh(mesh_spec)
    att = ShardedDeltaAttempt2D(geom, prm, calc_mode, mesh,
                                interpret=True)
    wp2 = jax.device_put(pad_state_2d(w, geom, mesh.shape["y"]),
                         padded_sharding_2d(mesh))
    (y, spec), eps = att.attempt(t, h, att.pack(wp2))
    full = jnp.concatenate([spec, wp2[2:3]], axis=0)
    return (np.asarray(unpad_state_2d(full, geom))[:2],
            float(jnp.max(eps)), att, y, spec)


class TestAttempt2D:
    @pytest.mark.parametrize("mesh_spec", MESHES_2D[1:])
    @pytest.mark.parametrize("calc_mode", [0, 2])
    def test_mesh_shape_bitwise_invariance(self, case, mesh_spec,
                                           calc_mode):
        """Every 2-D mesh shape must produce the z2,y1 reference's bits
        exactly — including different ghost-extension widths."""
        geom, prm, w = case
        t, h = 7200.0, 0.05
        ref, eps_ref, *_ = _attempt_2d(geom, prm, calc_mode, w,
                                       MESHES_2D[0], t, h)
        got, eps, *_ = _attempt_2d(geom, prm, calc_mode, w, mesh_spec,
                                   t, h)
        assert np.array_equal(got, ref)
        assert eps == eps_ref

    def test_matches_single_device_to_ulps(self, case):
        """vs the production single-device DeltaAttempt: equal to
        FMA-contraction ulps (see module docstring)."""
        geom, prm, w = case
        t, h = 7200.0, 0.05
        single = DeltaAttempt(geom, prm, 0, interpret=True)
        wp = pad_state(w, geom)
        (_, spec_s), eps_s = single.attempt(t, h, single.pack(wp))
        want = np.asarray(unpad_state(
            jnp.concatenate([spec_s, wp[2:3]], axis=0), geom))[:2]
        got, eps, *_ = _attempt_2d(geom, prm, 0, w, "z2,y2", t, h)
        np.testing.assert_allclose(got, want, rtol=3e-5, atol=1e-6)
        assert abs(eps - float(jnp.max(eps_s))) <= 3e-5 * eps + 1e-9

    def test_dirichlet_switch_2d(self, case):
        """A step crossing phase_switch_time exercises the nonzero
        increment ghost dDi on the top z-shard — bitwise across
        shapes there too."""
        geom, prm, w = case
        t = prm.phase_switch_time - 0.01
        h = 0.05
        ref, eps_ref, *_ = _attempt_2d(geom, prm, 0, w, "z2,y1", t, h)
        got, eps, *_ = _attempt_2d(geom, prm, 0, w, "z2,y4", t, h)
        assert np.array_equal(got, ref)
        assert eps == eps_ref

    def test_solver_step_counts_match_single(self, case):
        """An adaptive integration over the 2-D mesh takes the same
        accepted/total steps as the single-device delta path (the
        ulp-level kernel difference does not reach the controller)."""
        geom, prm, w = case
        params = MersonParams(delta=1e-3, h_min=1e-7, max_steps=400)
        single = DeltaAttempt(geom, prm, 0, interpret=True)
        st_s = merson_init(single.pack(pad_state(w, geom)), 7200.0, 0.5)
        solve_s = jax.jit(lambda s: merson_solve(
            lambda *a: None, s, 7205.0, params, attempt_fn=single))
        out_s, stat_s = solve_s(st_s)

        mesh = make_mesh("z2,y2")
        sharded = ShardedDeltaAttempt2D(geom, prm, 0, mesh,
                                        interpret=True)
        wp2 = jax.device_put(pad_state_2d(w, geom, 2),
                             padded_sharding_2d(mesh))
        st_m = merson_init(sharded.pack(wp2), 7200.0, 0.5)
        solve_m = jax.jit(lambda s: merson_solve(
            lambda *a: None, s, 7205.0, params, attempt_fn=sharded))
        out_m, stat_m = solve_m(st_m)
        assert int(stat_s) == int(stat_m) == 0
        assert int(out_s.steps) == int(out_m.steps)
        assert int(out_s.steps_total) == int(out_m.steps_total)
        np.testing.assert_allclose(
            np.asarray(unpad_state_2d(out_m.y, geom)),
            np.asarray(unpad_state(out_s.y, geom)),
            rtol=5e-5, atol=1e-5)
