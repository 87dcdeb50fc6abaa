"""Pallas fused stage kernel vs the XLA stencil (interpret mode on CPU),
for both the 'flat' (lane-efficient) and 'block' layouts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from porousfreezethaw_tpu.core.grid import GridGeometry
from porousfreezethaw_tpu.models.freezing import make_rhs
from porousfreezethaw_tpu.ops.pallas.stencil import (
    flat_extent, fused_stage_available, make_fused_attempt, make_fused_stage,
    pad_state, padded_extents, padded_shape, unpad_state)
from porousfreezethaw_tpu.solvers import MersonParams, merson_init, merson_solve

from tests.test_freezing_equation import default_params

LAYOUTS = ["flat", "block"]


@pytest.fixture(scope="module")
def case():
    geom = GridGeometry(0.03, 0.03, 0.06, 20, 10, 12)
    prm = default_params()
    rng = np.random.RandomState(3)
    w = jnp.asarray(np.stack([
        273.15 + 10 * (rng.random_sample(geom.shape) - 0.5),
        rng.random_sample(geom.shape),
        rng.random_sample(geom.shape) * 0.6]), jnp.float32)
    K1 = jnp.asarray(rng.standard_normal((3,) + geom.shape), jnp.float32)
    K3 = jnp.asarray(rng.standard_normal((3,) + geom.shape), jnp.float32)
    return geom, prm, w, K1, K3


def zero_pad_region(kp, geom, layout):
    nv = kp.shape[0]
    if layout == "flat":
        flat = kp.reshape(nv, geom.n3, -1)
        flat = flat.at[:, :, geom.n2 * geom.n1:].set(0.0)
        return flat.reshape(kp.shape)
    return (kp.at[:, :, geom.n2:, :].set(0.0)
            .at[:, :, :, geom.n1:].set(0.0))


def pad_k(k3, geom, layout):
    """Pad a 3-var K array to the kernel's 2-dynamic-var K layout."""
    return zero_pad_region(pad_state(k3[:2], geom, layout), geom, layout)


class TestLayouts:
    def test_padded_shapes(self, case):
        geom = case[0]
        assert padded_extents(geom) == (16, 128)
        # tile-aligned (whole (8,128) tiles): 200 -> 1024
        assert flat_extent(geom) == 1024
        assert padded_shape(geom, "flat") == (3, 12, 8, 128)
        assert padded_shape(geom, "block") == (3, 12, 16, 128)
        # reference grids stay low-overhead: MR plane 10000 -> 10240
        mr = GridGeometry(0.03, 0.03, 0.06, 100, 100, 200)
        assert flat_extent(mr) == 10240
        hr = GridGeometry(0.03, 0.03, 0.06, 200, 200, 400)
        assert flat_extent(hr) == 40960

    @pytest.mark.parametrize("layout", LAYOUTS)
    def test_pad_roundtrip(self, case, layout):
        geom, _, w, _, _ = case
        wp = pad_state(w, geom, layout)
        assert wp.shape == padded_shape(geom, layout)
        np.testing.assert_array_equal(unpad_state(wp, geom, layout), w)

    def test_available(self):
        assert fused_stage_available(jnp.float32)
        assert not fused_stage_available(jnp.float64)


class TestFusedStage:
    @pytest.mark.parametrize("layout", LAYOUTS)
    @pytest.mark.parametrize("mode", [0, 1, 2, 10, 11])
    def test_stage_matches_xla(self, case, mode, layout):
        geom, prm, w, K1, K3 = case
        rhs = make_rhs(geom, prm, mode)
        stage = make_fused_stage(geom, prm, mode, bz=4, layout=layout,
                                 interpret=True)
        wp = pad_state(w, geom, layout)
        K1p = pad_k(K1, geom, layout)
        K3p = pad_k(K3, geom, layout)

        h = 1e-3
        # the kernel's K arrays carry only the dynamic u, p (gl static):
        # its combination sees K_gl = 0
        K1z = jnp.asarray(K1).at[2].set(0.0)
        K3z = jnp.asarray(K3).at[2].set(0.0)
        aux = w + h * (0.125 * K1z + 0.375 * K3z)
        want = np.asarray(rhs(100.0, aux))[:2]
        got_p = stage(100.0, h, wp, [(0.125, K1p), (0.375, K3p)])
        got = np.asarray(unpad_state(got_p, geom, layout))
        scale = np.max(np.abs(want)) + 1e-30
        assert np.max(np.abs(got - want)) / scale < (5e-5 if mode == 2 else 1e-5)
        # pad region of the output must be exactly zero
        if layout == "flat":
            flat = np.asarray(got_p).reshape(2, geom.n3, -1)
            assert float(np.abs(flat[:, :, geom.n2 * geom.n1:]).max()) == 0.0
        else:
            assert float(jnp.abs(got_p[:, :, geom.n2:, :]).max()) == 0.0

    @pytest.mark.parametrize("layout", LAYOUTS)
    def test_dirichlet_switch(self, case, layout):
        geom, prm, w, _, _ = case
        stage = make_fused_stage(geom, prm, 0, bz=4, layout=layout,
                                 interpret=True)
        rhs = make_rhs(geom, prm, 0)
        wp = pad_state(w, geom, layout)
        for t in (prm.phase_switch_time - 1, prm.phase_switch_time + 1):
            got = np.asarray(unpad_state(stage(t, 1e-3, wp, []), geom, layout))
            want = np.asarray(rhs(t, w))[:2]
            assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-5

    @pytest.mark.parametrize("layout", LAYOUTS)
    def test_stage5_fused_tail(self, case, layout):
        """stage5 must return the in-VMEM error max and the speculative
        accepted state (dynamic variables only — K5 is never
        materialized), matching the separate-pass formulas."""
        geom, prm, w, K1, K3 = case
        rhs = make_rhs(geom, prm, 0)
        stage = make_fused_stage(geom, prm, 0, bz=4, layout=layout,
                                 interpret=True)
        rng = np.random.RandomState(7)
        K4 = jnp.asarray(rng.standard_normal((3,) + geom.shape), jnp.float32)
        wp = pad_state(w, geom, layout)
        K1p = pad_k(K1, geom, layout)
        K3p = pad_k(K3, geom, layout)
        K4p = pad_k(K4, geom, layout)

        h = 1e-3
        ks = [(0.5, K1p), (-1.5, K3p), (2.0, K4p)]
        y_spec_p, eps_blocks = stage.stage5(100.0 + h, h, wp, ks)

        # K5 from the plain stage call (2 dynamic vars)
        K5p = stage(100.0 + h, h, wp, ks)
        K5 = np.asarray(unpad_state(K5p, geom, layout))
        err = np.abs(0.2 * np.asarray(K1)[:2] - 0.9 * np.asarray(K3)[:2]
                     + 0.8 * np.asarray(K4)[:2] - 0.1 * K5)
        want_eps = float(err.max())
        got_eps = float(jnp.max(eps_blocks))
        assert abs(got_eps - want_eps) <= 1e-5 * want_eps

        want_y = np.asarray(w)[:2] + (h / 3.0) * (
            0.5 * (np.asarray(K1)[:2] + K5) + 2.0 * np.asarray(K4)[:2])
        got_y = np.asarray(unpad_state(y_spec_p, geom, layout))
        np.testing.assert_allclose(got_y, want_y, rtol=1e-5, atol=1e-6)
        # rhs sanity: K5 itself matches the XLA stencil on the combination
        # (the kernel's K_gl is identically 0)
        K1z = jnp.asarray(K1).at[2].set(0.0)
        K3z = jnp.asarray(K3).at[2].set(0.0)
        K4z = jnp.asarray(K4).at[2].set(0.0)
        aux = w + h * (0.5 * K1z - 1.5 * K3z + 2.0 * K4z)
        want_k5 = np.asarray(rhs(100.0 + h, aux))[:2]
        scale = np.abs(want_k5).max()
        assert np.abs(K5 - want_k5).max() / scale < 1e-5

    def test_stage5_commit(self, case):
        """stage.commit must write the partial y_spec into the dynamic
        variables and leave gl untouched, respecting the accept flag."""
        geom, prm, w, K1, K3 = case
        stage = make_fused_stage(geom, prm, 0, bz=4, interpret=True)
        wp = pad_state(w, geom)
        ks = [(0.5, pad_k(K1, geom, "flat")), (-1.5, pad_k(K3, geom, "flat")),
              (2.0, pad_k(K1, geom, "flat"))]
        y_spec, _ = stage.stage5(100.0, 1e-3, wp, ks)
        acc = stage.commit(wp, y_spec, jnp.asarray(True))
        rej = stage.commit(wp, y_spec, jnp.asarray(False))
        np.testing.assert_array_equal(np.asarray(acc[:2]), np.asarray(y_spec))
        np.testing.assert_array_equal(np.asarray(acc[2]), np.asarray(wp[2]))
        np.testing.assert_array_equal(np.asarray(rej), np.asarray(wp))

    def test_stage5_solver_integration(self, case):
        """merson_solve with the fused stage5 tail + partial commit must
        track a generic stage_fn path (full 3-var K's lifted from the same
        kernels, solver-side error/update) step-for-step."""
        geom, prm, w, _, _ = case
        stage = make_fused_stage(geom, prm, 0, bz=4, interpret=True)

        def plain(t, h, y, ks):
            # lift the 2-var kernel K to a full-state K (K_gl = 0) so the
            # solver's generic error estimate + update path runs
            k2 = stage(t, h, y, [(c, k[:2]) for c, k in ks])
            return jnp.concatenate([k2, jnp.zeros_like(y[2:])], axis=0)

        params = MersonParams(delta=1e-3, h_min=1e-9, max_steps=30)
        st_a, _ = merson_solve(None, merson_init(pad_state(w, geom), 0.0, 1e-4),
                               1.0, params, stage_fn=stage)
        st_b, _ = merson_solve(None, merson_init(pad_state(w, geom), 0.0, 1e-4),
                               1.0, params, stage_fn=plain)
        assert int(st_a.steps) == int(st_b.steps)
        assert int(st_a.steps_total) == int(st_b.steps_total)
        np.testing.assert_allclose(np.asarray(st_a.y), np.asarray(st_b.y),
                                   rtol=2e-5, atol=1e-6)
        assert float(st_a.t) == float(st_b.t)

    def test_attempt_pipeline_matches_stage5(self, case):
        """The double-buffered FusedAttempt must reproduce the stage5 path
        bit-for-bit (same kernels, different state plumbing)."""
        geom, prm, w, _, _ = case
        stage = make_fused_stage(geom, prm, 0, bz=4, interpret=True)
        att = make_fused_attempt(geom, prm, 0, bz=4, interpret=True)
        wp = pad_state(w, geom)
        t, h = 100.0, 1e-3

        carry = att.pack(wp)
        carry_spec, eps_blk = att.attempt(t, h, carry)

        K1 = stage(t, h, wp, [])
        K2 = stage(t + h / 3, h, wp, [(1 / 3, K1)])
        K3 = stage(t + h / 3, h, wp, [(1 / 6, K1), (1 / 6, K2)])
        K4 = stage(t + h / 2, h, wp, [(1 / 8, K1), (3 / 8, K3)])
        y_spec, eps_blk_ref = stage.stage5(
            t + h, h, wp, [(0.5, K1), (-1.5, K3), (2.0, K4)])

        # FusedAttempt carries full 3-var K buffers whose gl error rows
        # are identically zero, so the eps maxima agree exactly
        assert float(jnp.max(eps_blk)) == float(jnp.max(eps_blk_ref))
        accepted = att.commit(carry_spec, jnp.asarray(True))
        np.testing.assert_array_equal(np.asarray(att.unpack(accepted))[:2],
                                      np.asarray(y_spec))
        np.testing.assert_array_equal(np.asarray(att.unpack(accepted))[2],
                                      np.asarray(wp)[2])
        rejected = att.commit(carry_spec, jnp.asarray(False))
        np.testing.assert_array_equal(np.asarray(att.unpack(rejected)),
                                      np.asarray(wp))

    def test_attempt_solver_integration(self, case):
        """merson_solve(attempt_fn=...) must track the stage_fn path
        step-for-step."""
        geom, prm, w, _, _ = case
        stage = make_fused_stage(geom, prm, 0, bz=4, interpret=True)
        att = make_fused_attempt(geom, prm, 0, bz=4, interpret=True)
        params = MersonParams(delta=1e-3, h_min=1e-9, max_steps=30)
        st_a, _ = merson_solve(None, merson_init(pad_state(w, geom), 0.0, 1e-4),
                               1.0, params, attempt_fn=att)
        st_b, _ = merson_solve(None, merson_init(pad_state(w, geom), 0.0, 1e-4),
                               1.0, params, stage_fn=stage)
        assert int(st_a.steps) == int(st_b.steps)
        assert int(st_a.steps_total) == int(st_b.steps_total)
        assert float(st_a.t) == float(st_b.t)
        np.testing.assert_allclose(np.asarray(st_a.y), np.asarray(st_b.y),
                                   rtol=2e-5, atol=1e-6)

    def test_shape_validation(self, case):
        geom, prm, w, _, _ = case
        stage = make_fused_stage(geom, prm, 0, bz=4, interpret=True)
        with pytest.raises(ValueError, match="padded 'flat' layout"):
            stage(0.0, 1e-3, w, [])  # unpadded input


class TestFusedMerson:
    def test_single_attempt_matches_default_path(self, case):
        """One Merson attempt through stage_fn must agree with the default
        path to f32 rounding (longer runs diverge chaotically once a single
        f32-level accept/reject decision differs)."""
        geom, prm, w, _, _ = case
        rhs = make_rhs(geom, prm, 0)
        stage = make_fused_stage(geom, prm, 0, bz=4, interpret=True)
        params = MersonParams(delta=1e-3, h_min=1e-9, max_steps=1)

        st_ref, status_ref = merson_solve(
            rhs, merson_init(w, 0.0, 1e-4), 1.0, params)
        st_f, status_f = merson_solve(
            None, merson_init(pad_state(w, geom), 0.0, 1e-4), 1.0, params,
            stage_fn=stage)
        assert int(st_f.steps) == int(st_ref.steps) == 1
        got = np.asarray(unpad_state(st_f.y, geom))
        np.testing.assert_allclose(got, np.asarray(st_ref.y),
                                   rtol=1e-4, atol=1e-5)
        # eps is a catastrophic cancellation of the K's, so at f32 both
        # paths sit on the rounding noise floor and the step estimate can
        # differ by tens of percent; only sanity-check it
        assert 0 < float(st_f.h) < 10 * float(st_ref.h)

    def test_multi_step_counts_close(self, case):
        geom, prm, w, _, _ = case
        rhs = make_rhs(geom, prm, 0)
        stage = make_fused_stage(geom, prm, 0, bz=4, interpret=True)
        params = MersonParams(delta=1e-3, h_min=1e-9, max_steps=30)
        st_ref, _ = merson_solve(rhs, merson_init(w, 0.0, 1e-4), 1.0, params)
        st_f, _ = merson_solve(None, merson_init(pad_state(w, geom), 0.0, 1e-4),
                               1.0, params, stage_fn=stage)
        assert abs(int(st_f.steps) - int(st_ref.steps)) <= 2
        assert np.all(np.isfinite(np.asarray(st_f.y)))
