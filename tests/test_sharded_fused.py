"""Sharded fused Pallas path: shard_map + per-stage z-halo ppermute must
reproduce the single-device fused kernels bitwise, and the full Merson
solve must be invariant to the mesh size — the reference's rank-count
invariance oracle (GradP step counts identical on 1 and 4 nodes,
SURVEY §6), applied to the fused hot path.

Runs in Pallas interpret mode on the 8-virtual-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from porousfreezethaw_tpu.core.grid import GridGeometry
from porousfreezethaw_tpu.ops.pallas.stencil import (
    make_fused_stage, pad_state, padded_k_shape, unpad_state)
from porousfreezethaw_tpu.parallel.fused import (
    make_sharded_fused_stage, padded_sharding)
from porousfreezethaw_tpu.parallel.sharding import make_mesh
from porousfreezethaw_tpu.solvers import MersonParams, merson_init, merson_solve

from tests.test_freezing_equation import default_params


@pytest.fixture(scope="module")
def case():
    geom = GridGeometry(0.03, 0.03, 0.06, 20, 10, 16)
    prm = default_params()
    rng = np.random.RandomState(7)
    w = jnp.asarray(np.stack([
        273.15 + 10 * (rng.random_sample(geom.shape) - 0.5),
        rng.random_sample(geom.shape),
        rng.random_sample(geom.shape) * 0.6]), jnp.float32)
    return geom, prm, w


MESHES = ["z2", "z4", "z8"]


class TestStageEquivalence:
    @pytest.mark.parametrize("mesh_spec", MESHES)
    @pytest.mark.parametrize("calc_mode", [0, 1, 2, 10, 11])
    def test_stage5_bitwise(self, case, mesh_spec, calc_mode):
        geom, prm, w = case
        rng = np.random.RandomState(11)
        wp = pad_state(w, geom)
        kshape = padded_k_shape(geom)
        ks_np = [jnp.asarray(rng.standard_normal(kshape), jnp.float32)
                 for _ in range(3)]
        single = make_fused_stage(geom, prm, calc_mode, interpret=True)
        mesh = make_mesh(mesh_spec)
        sharded = make_sharded_fused_stage(geom, prm, calc_mode, mesh,
                                           interpret=True)
        sh = padded_sharding(mesh)
        put = lambda x: jax.device_put(x, sh)
        t, h = 7200.0, 0.05
        combo = [(0.5, ks_np[0]), (-1.5, ks_np[1]), (2.0, ks_np[2])]
        combo_s = [(c, put(k)) for c, k in combo]

        a_y, a_eps = single.stage5(t, h, wp, combo)
        b_y, b_eps = sharded.stage5(t, h, put(wp), combo_s)
        assert np.array_equal(np.asarray(a_y), np.asarray(b_y))
        assert float(jnp.max(a_eps)) == float(jnp.max(b_eps))
        # the plain stage K's must agree bitwise too
        a_k = single(t, h, wp, combo)
        b_k = sharded(t, h, put(wp), combo_s)
        assert np.array_equal(np.asarray(a_k), np.asarray(b_k))

    def test_stage1_dirichlet_switch(self, case):
        # t beyond phase_switch_time exercises the top_temp2 branch of
        # the Dirichlet ghost construction
        geom, prm, w = case
        wp = pad_state(w, geom)
        single = make_fused_stage(geom, prm, 0, interpret=True)
        mesh = make_mesh("z4")
        sharded = make_sharded_fused_stage(geom, prm, 0, mesh,
                                           interpret=True)
        t_late = prm.phase_switch_time + 100.0
        a = single(t_late, 0.05, wp, [])
        b = sharded(t_late, 0.05, jax.device_put(wp, padded_sharding(mesh)),
                    [])
        assert np.array_equal(np.asarray(a), np.asarray(b))


class TestSolveInvariance:
    def test_merson_solve_mesh_invariant(self, case):
        """Full adaptive solve: identical fields AND step counts on 1, 2
        and 8 shards (the reference's rank-count invariance)."""
        geom, prm, w = case
        wp = pad_state(w, geom)
        params = MersonParams(delta=1e-3, h_min=1e-6)

        results = {}
        for spec in [None, "z2", "z8"]:
            if spec is None:
                stage = make_fused_stage(geom, prm, 0, interpret=True)
                y0 = wp
            else:
                mesh = make_mesh(spec)
                stage = make_sharded_fused_stage(geom, prm, 0, mesh,
                                                 interpret=True)
                y0 = jax.device_put(wp, padded_sharding(mesh))
            state = merson_init(y0, t0=0.0, h0=0.05)
            solve = jax.jit(lambda st, fn=stage: merson_solve(
                lambda t, y: y, st, 0.5, params, stage_fn=fn))
            out, status = solve(state)
            assert int(status) == 0
            results[spec] = (int(out.steps), int(out.steps_total),
                             np.asarray(unpad_state(out.y, geom)))

        base_steps, base_total, base_y = results[None]
        assert base_steps > 3  # the solve actually stepped
        for spec in ["z2", "z8"]:
            steps, total, y = results[spec]
            assert (steps, total) == (base_steps, base_total)
            assert np.array_equal(y, base_y)
