"""Dormand-Prince 5(4) adaptive integrator (the "ode45 twin").

The reference validates its C DEM simulator against a MATLAB twin driven
by ``ode45`` (Dormand-Prince) with RelTol/AbsTol control
(``apps/sphere-collider-MATLAB/spheres.m:38-40``); the two independent
integrators agreeing on the settled bed is part of its test strategy
(SURVEY §4.3).  This module provides the same second, independent
integrator for cross-validating the Merson solver: the classic DP5(4)
FSAL pair with MATLAB-style mixed relative/absolute error control

    err = max_i |e_i| / max(AbsTol, RelTol * max(|y_i|, |y_new_i|))
    accept iff err <= 1;  h *= min(5, max(0.2, 0.9 * err^(-1/5)))

implemented, like the Merson solver, as a single jittable
``lax.while_loop`` over arbitrary pytrees.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax, tree_util

# Dormand-Prince tableau (Butcher coefficients)
_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0)
_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
)
_B5 = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
_B4 = (5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200,
       187 / 2100, 1 / 40)
_E = tuple(b5 - b4 for b5, b4 in zip(_B5, _B4))


class DopriResult(NamedTuple):
    t: jax.Array
    y: Any
    h: jax.Array
    steps: jax.Array
    steps_total: jax.Array


def dopri45_solve(rhs: Callable, t0, y0, t_final, h0, *,
                  rtol: float = 1e-6, atol: float = 1e-4,
                  max_step: float = jnp.inf, max_steps: int = 2**62
                  ) -> DopriResult:
    """Integrate ``y' = rhs(t, y)`` from t0 to t_final.  Jittable."""
    leaves = tree_util.tree_leaves(y0)
    dtype = leaves[0].dtype
    t0 = jnp.asarray(t0, dtype)
    tf = jnp.asarray(t_final, dtype)
    direction = jnp.where(tf >= t0, 1.0, -1.0).astype(dtype)
    h0 = direction * jnp.minimum(jnp.abs(jnp.asarray(h0, dtype)),
                                 jnp.asarray(max_step, dtype))
    threshold = atol / rtol

    def axpys(y, Ks, coefs, h):
        def leaf(yv, *kvs):
            acc = yv
            for c, kv in zip(coefs, kvs):
                acc = acc + (h * c) * kv
            return acc
        return tree_util.tree_map(leaf, y, *Ks)

    def err_norm(Ks, y, y_new, h):
        def leaf(yv, nv, *kvs):
            e = jnp.zeros_like(yv)
            for c, kv in zip(_E, kvs):
                e = e + c * kv
            scale = jnp.maximum(jnp.maximum(jnp.abs(yv), jnp.abs(nv)),
                                threshold)
            return jnp.max(jnp.abs(h * e) / scale)
        per_leaf = tree_util.tree_map(leaf, y, y_new, *Ks)
        return tree_util.tree_reduce(jnp.maximum, per_leaf)

    def body(carry):
        t, h, y, k1, steps, steps_total, done = carry
        Ks = [k1]
        for s in range(1, 7):
            ys = axpys(y, Ks, _A[s], h)
            Ks.append(rhs(t + _C[s] * h, ys))
        y_new = axpys(y, Ks, _B5, h)  # == stage-7 input (FSAL)
        err = err_norm(Ks, y, y_new, h) / rtol
        accept = err <= 1.0

        steps_total = steps_total + 1
        t_new = jnp.where(accept, t + h, t)
        y = tree_util.tree_map(
            lambda a, b: jnp.where(accept, b, a), y, y_new)
        k1 = tree_util.tree_map(
            lambda a, b: jnp.where(accept, b, a), k1, Ks[6])
        steps = jnp.where(accept, steps + 1, steps)

        factor = jnp.where(err > 0, 0.9 * err ** jnp.asarray(-0.2, dtype), 5.0)
        factor = jnp.clip(factor, 0.2, 5.0)
        h_new = h * factor
        h_new = direction * jnp.minimum(jnp.abs(h_new),
                                        jnp.asarray(max_step, dtype))
        # trim to the final time
        remaining = tf - t_new
        h_new = jnp.where(jnp.abs(h_new) > jnp.abs(remaining), remaining, h_new)
        done = accept & (jnp.abs(remaining) <= 0.0)
        return (t_new, h_new, y, k1, steps, steps_total, done)

    k1_0 = rhs(t0, y0)
    h_start = jnp.where(jnp.abs(h0) > jnp.abs(tf - t0), tf - t0, h0)
    carry = (t0, h_start, y0, k1_0,
             jnp.asarray(0, jnp.int64 if jax.config.read("jax_enable_x64")
                         else jnp.int32),
             jnp.asarray(0, jnp.int64 if jax.config.read("jax_enable_x64")
                         else jnp.int32),
             jnp.asarray(False))

    def cond(carry):
        return ~carry[6] & (carry[5] < max_steps)

    t, h, y, _k1, steps, steps_total, _ = lax.while_loop(cond, body, carry)
    return DopriResult(t=t, y=y, h=h, steps=steps, steps_total=steps_total)
