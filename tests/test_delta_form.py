"""Increment-form (delta) RHS: exactness vs the direct evaluation and
the f32 error-estimator noise-floor elimination it exists for."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from porousfreezethaw_tpu.core.grid import GridGeometry
from porousfreezethaw_tpu.models.freezing import make_rhs
from porousfreezethaw_tpu.models.freezing.delta import make_g_rhs

from tests.test_freezing_equation import default_params

MODES = [0, 1, 2, 10, 11]


@pytest.fixture(scope="module")
def case():
    geom = GridGeometry(0.03, 0.03, 0.06, 12, 10, 14)
    prm = default_params()
    rng = np.random.RandomState(7)
    w = np.stack([
        273.15 + 10 * (rng.random_sample(geom.shape) - 0.5),
        rng.random_sample(geom.shape),
        rng.random_sample(geom.shape) * 0.6])
    K = rng.standard_normal((2,) + geom.shape)
    return geom, prm, w, K


@pytest.mark.parametrize("mode", MODES)
def test_g_matches_direct_difference_f64(case, mode):
    """G(t1, ti, w, d) == f(ti, w+d) - f(t1, w) as an identity (f64)."""
    geom, prm, w, K = case
    rhs = make_rhs(geom, prm, calc_mode=mode)
    g = make_g_rhs(geom, prm, calc_mode=mode)
    w64 = jnp.asarray(w, jnp.float64)
    for h in (1e-3, 1e-1, 10.0):
        d = jnp.asarray(h * K, jnp.float64)
        t1, ti = 100.0, 100.0 + h
        wd = w64.at[:2].add(d)
        direct = (rhs(ti, wd) - rhs(t1, w64))[:2]
        G = g(t1, ti, w64, d)
        scale = np.maximum(np.abs(np.asarray(direct)), 1e-3)
        np.testing.assert_allclose(np.asarray(G) / scale,
                                   np.asarray(direct) / scale,
                                   atol=1e-9)


def test_g_dirichlet_switch_step(case):
    """A step crossing phase_switch_time sees different Dirichlet values
    per stage; the delta ghost D(ti)-D(t1) keeps G exact."""
    geom, prm, w, K = case
    rhs = make_rhs(geom, prm, calc_mode=0)
    g = make_g_rhs(geom, prm, calc_mode=0)
    w64 = jnp.asarray(w, jnp.float64)
    d = jnp.asarray(1e-2 * K, jnp.float64)
    t1 = prm.phase_switch_time - 1.0
    ti = prm.phase_switch_time + 1.0  # crosses the switch
    wd = w64.at[:2].add(d)
    direct = (rhs(ti, wd) - rhs(t1, w64))[:2]
    G = g(t1, ti, w64, d)
    scale = np.maximum(np.abs(np.asarray(direct)), 1e-3)
    np.testing.assert_allclose(np.asarray(G) / scale,
                               np.asarray(direct) / scale, atol=1e-9)


@pytest.mark.parametrize("mode", [0, 1, 2])
def test_f32_estimator_floor_removed(case, mode):
    """The Merson error combination computed from f32 G's tracks the f64
    truth far better than the classic f32 stage evaluation: the classic
    path's stage-state rounding floor (~ulp(w)*|J|) is absent.

    Builds K1/K3/K4/K5 via the actual stage algebra at a small h where
    the true estimate is tiny, then compares |est_f32 - est_f64|."""
    geom, prm, w, _ = case
    h = 1e-6  # true estimate ~h^4-scale: rounding floors dominate
    t = 100.0

    def estimate(dtype, use_delta):
        w_ = jnp.asarray(w, dtype)
        rhs = make_rhs(geom, prm, calc_mode=mode)
        if not use_delta:
            K1 = rhs(t, w_)[:2]
            y2 = w_.at[:2].add(jnp.asarray(h / 3, dtype) * K1)
            K2 = rhs(t + h / 3, y2)[:2]
            y3 = w_.at[:2].add(jnp.asarray(h / 6, dtype) * (K1 + K2))
            K3 = rhs(t + h / 3, y3)[:2]
            y4 = w_.at[:2].add(jnp.asarray(h / 8, dtype) * (K1 + 3 * K3))
            K4 = rhs(t + h / 2, y4)[:2]
            y5 = w_.at[:2].add(jnp.asarray(h, dtype)
                               * (0.5 * K1 - 1.5 * K3 + 2 * K4))
            K5 = rhs(t + h, y5)[:2]
            return 0.2 * K1 - 0.9 * K3 + 0.8 * K4 - 0.1 * K5
        g = make_g_rhs(geom, prm, calc_mode=mode)
        rhs_ = make_rhs(geom, prm, calc_mode=mode)
        hh = jnp.asarray(h, dtype)
        K1 = rhs_(t, w_)[:2]
        G2 = g(t, t + h / 3, w_, hh / 3 * K1)
        G3 = g(t, t + h / 3, w_, hh * (K1 / 3 + G2 / 6))
        G4 = g(t, t + h / 2, w_, hh * (K1 / 2 + 0.375 * G3))
        G5 = g(t, t + h, w_, hh * (K1 - 1.5 * G3 + 2 * G4))
        return -0.9 * G3 + 0.8 * G4 - 0.1 * G5

    ref = np.asarray(estimate(jnp.float64, False))
    err_classic = np.max(np.abs(np.asarray(
        estimate(jnp.float32, False)).astype(np.float64) - ref))
    err_delta = np.max(np.abs(np.asarray(
        estimate(jnp.float32, True)).astype(np.float64) - ref))
    # the classic path floors at ulp(w)*|J|; measured improvement:
    # GradP 3.2e6x, SigmaP 1.6e6x, Temp 29x (its classic floor is
    # already tiny — the model is not noise-pinned in practice)
    factor = {0: 1e4, 1: 1e4, 2: 10.0}[mode]
    assert err_delta < err_classic / factor, (err_delta, err_classic)


class TestDeltaAttemptPallas:
    """Pallas increment-form kernels (interpret mode) vs the XLA oracle."""

    def _padded(self, case):
        from porousfreezethaw_tpu.ops.pallas.stencil import pad_state
        geom, prm, w, _ = case
        w32 = jnp.asarray(w, jnp.float32)
        return geom, prm, w32, pad_state(w32, geom)

    @pytest.mark.parametrize("mode", [0, 1, 2])
    def test_attempt_matches_xla(self, case, mode):
        from porousfreezethaw_tpu.ops.pallas.stencil import (
            make_delta_attempt, unpad_state)
        geom, prm, w32, wp = self._padded(case)
        att = make_delta_attempt(geom, prm, mode, bz=2, interpret=True)
        # h large enough that the true estimate sits well above the G
        # paths' relative rounding (Pallas and XLA sum faces in
        # different orders)
        t, h = 100.0, 0.05
        (y0, y_spec_p), eps_blocks = att.attempt(
            jnp.asarray(t, jnp.float64), jnp.asarray(h, jnp.float64), wp)
        got_eps = float(jnp.max(eps_blocks))
        y_spec = np.asarray(unpad_state(y_spec_p, geom))

        # XLA replication of the increment algebra in f32
        rhs = make_rhs(geom, prm, calc_mode=mode)
        g = make_g_rhs(geom, prm, calc_mode=mode)
        hh = jnp.asarray(h, jnp.float32)
        K1 = rhs(t, w32)[:2]
        G2 = g(t, t + h / 3, w32, hh / 3 * K1)
        G3 = g(t, t + h / 3, w32, hh * (K1 / 3 + G2 / 6))
        G4 = g(t, t + h / 2, w32, hh * (K1 / 2 + 0.375 * G3))
        G5 = g(t, t + h, w32, hh * (K1 - 1.5 * G3 + 2 * G4))
        est = np.asarray(-0.9 * G3 + 0.8 * G4 - 0.1 * G5)
        want_eps = float(np.abs(est).max())
        want_y = np.asarray(w32[:2] + hh * K1
                            + hh / 3 * (2 * G4 + 0.5 * G5))
        assert abs(got_eps - want_eps) <= 1e-3 * want_eps + 1e-7
        np.testing.assert_allclose(y_spec, want_y, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("mode", [0, 2])
    def test_xla_delta_attempt_matches_pallas(self, case, mode):
        """XlaDeltaAttempt (the golden-guard oracle / CPU path) and the
        Pallas DeltaAttempt implement the same attempt: same speculative
        state and error max up to layout-induced summation order."""
        from porousfreezethaw_tpu.models.freezing.delta import (
            XlaDeltaAttempt)
        from porousfreezethaw_tpu.ops.pallas.stencil import (
            make_delta_attempt, unpad_state)
        geom, prm, w32, wp = self._padded(case)
        t, h = 100.0, 0.05
        pal = make_delta_attempt(geom, prm, mode, bz=2, interpret=True)
        (_, spec_p), eps_p = pal.attempt(jnp.asarray(t, jnp.float64),
                                         jnp.asarray(h, jnp.float64), wp)
        xla = XlaDeltaAttempt(geom, prm, mode)
        (_, spec_x), eps_x = xla.attempt(jnp.asarray(t, jnp.float64),
                                         jnp.asarray(h, jnp.float64), w32)
        np.testing.assert_allclose(
            np.asarray(unpad_state(spec_p, geom)), np.asarray(spec_x),
            rtol=1e-5, atol=1e-5)
        a, b = float(jnp.max(eps_p)), float(jnp.max(eps_x))
        assert abs(a - b) <= 1e-3 * max(a, b) + 1e-7

    def test_solver_integration_tracks_f64(self, case):
        """merson_solve over the DeltaAttempt path (f32) must track the
        f64 reference trajectory and step counts on the stiff GradP
        model."""
        from porousfreezethaw_tpu.ops.pallas.stencil import (
            make_delta_attempt, pad_state, unpad_state)
        from porousfreezethaw_tpu.solvers.merson import (
            MersonParams, merson_init, merson_solve)
        geom, prm, w, _ = case
        params = MersonParams(delta=1e-3, h_min=1e-9, max_steps=200)

        st64, status64 = merson_solve(
            make_rhs(geom, prm, calc_mode=0),
            merson_init(jnp.asarray(w, jnp.float64), 0.0, 1e-4),
            0.05, params)
        assert int(status64) == 0

        att = make_delta_attempt(geom, prm, 0, bz=2, interpret=True)
        wp = pad_state(jnp.asarray(w, jnp.float32), geom)
        st32, status32 = merson_solve(
            None, merson_init(wp, 0.0, 1e-4), 0.05, params,
            attempt_fn=att)
        assert int(status32) == 0
        # step counts within a few of the f64 truth (no noise floor)
        assert abs(int(st32.steps) - int(st64.steps)) <= max(
            3, int(0.1 * int(st64.steps)))
        y32 = np.asarray(unpad_state(st32.y, geom))
        y64 = np.asarray(st64.y)
        scale = np.abs(y64[:2]).max()
        assert np.abs(y32[:2] - y64[:2]).max() / scale < 1e-4


class TestCompensatedCommit:
    """The compensated (double-f32) commit variants: XlaDeltaAttemptComp
    (oracle) and the Pallas DeltaAttemptComp (emit="dy" tail + TwoSum
    accumulation) — round 5."""

    def _padded(self, case):
        from porousfreezethaw_tpu.ops.pallas.stencil import pad_state
        geom, prm, w, _ = case
        w32 = jnp.asarray(w, jnp.float32)
        return geom, prm, w32, pad_state(w32, geom)

    def test_xla_comp_eps_matches_plain(self, case):
        """Same estimator as the plain delta attempt (only the commit
        changes); the committed hi state equals fl32(exact sum)."""
        from porousfreezethaw_tpu.models.freezing.delta import (
            XlaDeltaAttempt, XlaDeltaAttemptComp)
        geom, prm, w32, _ = self._padded(case)
        t, h = 100.0, 0.05
        plain = XlaDeltaAttempt(geom, prm, 0)
        comp = XlaDeltaAttemptComp(geom, prm, 0)
        (_, spec), eps_a = plain.attempt(t, h, w32)
        y5 = comp.pack(w32)
        assert comp.pack(y5).shape == y5.shape     # idempotent
        (_, dy), eps_b = comp.attempt(t, h, y5)
        np.testing.assert_allclose(float(jnp.max(eps_a)),
                                   float(jnp.max(eps_b)), rtol=1e-6)
        committed = comp.commit((y5, dy), jnp.asarray(True))
        # hi + lo == exact f64 sum of hi0 + dy to ~ulp^2
        exact = (np.asarray(w32[:2], np.float64)
                 + np.asarray(dy, np.float64))
        got = (np.asarray(committed[:2], np.float64)
               + np.asarray(committed[3:], np.float64))
        np.testing.assert_allclose(got, exact, rtol=0, atol=1e-12)
        # reject keeps everything
        kept = comp.commit((y5, dy), jnp.asarray(False))
        np.testing.assert_array_equal(np.asarray(kept), np.asarray(y5))

    def test_pallas_comp_matches_xla_comp(self, case):
        """Pallas DeltaAttemptComp == XlaDeltaAttemptComp: same dy (up
        to layout summation order), same eps, same committed (hi, lo)."""
        from porousfreezethaw_tpu.models.freezing.delta import (
            XlaDeltaAttemptComp)
        from porousfreezethaw_tpu.ops.pallas.stencil import (
            make_delta_attempt, unpad_state)
        geom, prm, w32, wp = self._padded(case)
        t, h = 100.0, 0.05
        pal = make_delta_attempt(geom, prm, 0, bz=2, interpret=True,
                                 compensated=True)
        y5p = pal.pack(wp)
        assert y5p.shape[0] == 5
        (_, dy_p), eps_p = pal.attempt(jnp.asarray(t, jnp.float64),
                                       jnp.asarray(h, jnp.float64), y5p)
        xla = XlaDeltaAttemptComp(geom, prm, 0)
        y5x = xla.pack(w32)
        (_, dy_x), eps_x = xla.attempt(t, h, y5x)
        np.testing.assert_allclose(
            np.asarray(unpad_state(dy_p, geom)), np.asarray(dy_x),
            rtol=1e-5, atol=1e-6)
        a, b = float(jnp.max(eps_p)), float(jnp.max(eps_x))
        assert abs(a - b) <= 1e-3 * max(a, b) + 1e-7
        com_p = pal.commit((y5p, dy_p), jnp.asarray(True))
        com_x = xla.commit((y5x, dy_x), jnp.asarray(True))
        np.testing.assert_allclose(
            np.asarray(unpad_state(com_p[:3], geom)),
            np.asarray(com_x[:3]), rtol=1e-5, atol=1e-6)
