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
