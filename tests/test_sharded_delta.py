"""Sharded increment-form (delta) attempt: shard_map + per-stage z-halo
ppermute of the raw w/K/G edge planes must reproduce the single-device
delta kernels bitwise, and the full adaptive solve must be invariant to
the mesh size — the reference's rank-count invariance oracle (SURVEY §4.2)
applied to the production f32 GradP path (the increment form,
models/freezing/delta.py), which as of round 4 rides the device mesh
instead of falling back to the classic kernels.

Runs in Pallas interpret mode on the 8-virtual-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from porousfreezethaw_tpu.core.grid import GridGeometry
from porousfreezethaw_tpu.ops.pallas.stencil import (
    DeltaAttempt, pad_state, padded_k_shape, unpad_state)
from porousfreezethaw_tpu.parallel.fused import (
    ShardedDeltaAttempt, padded_sharding)
from porousfreezethaw_tpu.parallel.sharding import make_mesh
from porousfreezethaw_tpu.solvers import MersonParams, merson_init, merson_solve

from tests.test_freezing_equation import default_params


@pytest.fixture(scope="module")
def case():
    geom = GridGeometry(0.03, 0.03, 0.06, 20, 10, 16)
    prm = default_params()
    rng = np.random.RandomState(3)
    w = jnp.asarray(np.stack([
        273.15 + 10 * (rng.random_sample(geom.shape) - 0.5),
        rng.random_sample(geom.shape),
        rng.random_sample(geom.shape) * 0.6]), jnp.float32)
    return geom, prm, w


MESHES = ["z2", "z4", "z8"]


class TestAttemptEquivalence:
    @pytest.mark.parametrize("mesh_spec", MESHES)
    @pytest.mark.parametrize("calc_mode", [0, 1, 2, 10, 11])
    def test_attempt_bitwise(self, case, mesh_spec, calc_mode):
        """One full delta attempt (K1 + G2..G5 + tail): the speculative
        state and the error max must match the single-device attempt
        bitwise on every mesh size."""
        geom, prm, w = case
        wp = pad_state(w, geom)
        single = DeltaAttempt(geom, prm, calc_mode, interpret=True)
        mesh = make_mesh(mesh_spec)
        sharded = ShardedDeltaAttempt(geom, prm, calc_mode, mesh,
                                      interpret=True)
        wp_s = jax.device_put(wp, padded_sharding(mesh))
        t, h = 7200.0, 0.05
        (y_a, spec_a), eps_a = single.attempt(t, h, single.pack(wp))
        (y_b, spec_b), eps_b = sharded.attempt(t, h, sharded.pack(wp_s))
        assert np.array_equal(np.asarray(spec_a), np.asarray(spec_b))
        assert float(jnp.max(eps_a)) == float(jnp.max(eps_b))
        # commit on both branches of accept
        for acc in (True, False):
            ca = single.commit((y_a, spec_a), jnp.asarray(acc))
            cb = sharded.commit((y_b, spec_b), jnp.asarray(acc))
            assert np.array_equal(np.asarray(ca), np.asarray(cb))

    def test_attempt_dirichlet_switch(self, case):
        """A step that crosses phase_switch_time makes the increment
        ghost dDi = D(ti)-D(t1) nonzero — the top-shard chain-end
        contract must still match single-device bitwise."""
        geom, prm, w = case
        wp = pad_state(w, geom)
        single = DeltaAttempt(geom, prm, 0, interpret=True)
        mesh = make_mesh("z4")
        sharded = ShardedDeltaAttempt(geom, prm, 0, mesh, interpret=True)
        wp_s = jax.device_put(wp, padded_sharding(mesh))
        t = prm.phase_switch_time - 0.01
        h = 0.05  # t + h crosses the Dirichlet jump
        (_, spec_a), eps_a = single.attempt(t, h, single.pack(wp))
        (_, spec_b), eps_b = sharded.attempt(t, h, sharded.pack(wp_s))
        assert np.array_equal(np.asarray(spec_a), np.asarray(spec_b))
        assert float(jnp.max(eps_a)) == float(jnp.max(eps_b))
        # the jump must actually be in play (estimator sees the step)
        assert np.isfinite(float(jnp.max(eps_a)))


class TestSolveInvariance:
    def test_merson_solve_mesh_invariant(self, case):
        """Full adaptive solve through the delta attempt: identical
        fields AND step counts on 1, 2 and 8 shards."""
        geom, prm, w = case
        wp = pad_state(w, geom)
        params = MersonParams(delta=1e-3, h_min=1e-6)

        results = {}
        for spec in [None, "z2", "z8"]:
            if spec is None:
                att = DeltaAttempt(geom, prm, 0, interpret=True)
                y0 = wp
            else:
                mesh = make_mesh(spec)
                att = ShardedDeltaAttempt(geom, prm, 0, mesh,
                                          interpret=True)
                y0 = jax.device_put(wp, padded_sharding(mesh))
            state = merson_init(y0, t0=0.0, h0=0.05)
            solve = jax.jit(lambda st, fn=att: merson_solve(
                lambda t, y: y, st, 0.5, params, attempt_fn=fn))
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


class TestCompensatedSharded:
    @pytest.mark.parametrize("mesh_spec", MESHES)
    def test_comp_attempt_bitwise(self, case, mesh_spec):
        """The compensated-commit variant must also be bitwise mesh-
        invariant.  This specifically guards the emit="dy" tail's
        contraction-proof formulation (round 5): the bare increment's
        low bits feed the TwoSum commit, and XLA would FMA-contract
        `h*K1 + x` in one program but not another without the int32
        bitcast laundering in the kernel (stencil.py)."""
        from porousfreezethaw_tpu.ops.pallas.stencil import DeltaAttemptComp
        geom, prm, w = case
        wp = pad_state(w, geom)
        single = DeltaAttemptComp(geom, prm, 0, interpret=True)
        mesh = make_mesh(mesh_spec)
        sharded = ShardedDeltaAttempt(geom, prm, 0, mesh,
                                      interpret=True, compensated=True)
        wp_s = jax.device_put(wp, padded_sharding(mesh))
        t, h = 7200.0, 0.05
        y5a = single.pack(wp)
        y5b = sharded.pack(wp_s)
        (ca_, dy_a), eps_a = single.attempt(t, h, y5a)
        (cb_, dy_b), eps_b = sharded.attempt(t, h, y5b)
        assert np.array_equal(np.asarray(dy_a), np.asarray(dy_b))
        assert float(jnp.max(eps_a)) == float(jnp.max(eps_b))
        for acc in (True, False):
            ca = single.commit((y5a, dy_a), jnp.asarray(acc))
            cb = sharded.commit((y5b, dy_b), jnp.asarray(acc))
            assert np.array_equal(np.asarray(ca), np.asarray(cb))
