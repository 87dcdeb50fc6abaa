"""Fixed-step classic RK4 integrator.

Equivalent of the reference's ``modules/RK_solver`` / ``modules/RK_csolver``
(``RK_solve(int steps, ...)`` — a fixed number of classic fourth-order steps
at constant h; RK_solver.c:77-180).  The two reference variants differ only
in buffer reuse, which is irrelevant under XLA; a single ``lax.scan``
implementation covers both.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax, tree_util


def rk4_step(rhs: Callable, t, y, h):
    """One classic RK4 step (tableau from RK_solver.c:130-180)."""
    h2, h3, h6 = h / 2, h / 3, h / 6
    axpy = lambda a, x, yy: tree_util.tree_map(lambda xi, yi: yi + a * xi, x, yy)
    K1 = rhs(t, y)
    K2 = rhs(t + h2, axpy(h2, K1, y))
    K3 = rhs(t + h2, axpy(h2, K2, y))
    K4 = rhs(t + h, axpy(h, K3, y))
    y_new = tree_util.tree_map(
        lambda yi, k1, k2, k3, k4: yi + h6 * (k1 + k4) + h3 * (k2 + k3),
        y, K1, K2, K3, K4)
    return t + h, y_new


def rk4_solve(rhs: Callable, t0, y0, h, steps: int) -> Tuple[jax.Array, Any]:
    """Run ``steps`` fixed RK4 steps; returns (t, y).  Jittable."""
    leaves = tree_util.tree_leaves(y0)
    dtype = leaves[0].dtype
    t0 = jnp.asarray(t0, dtype)
    h = jnp.asarray(h, dtype)

    def body(carry, _):
        t, y = carry
        t, y = rk4_step(rhs, t, y, h)
        return (t, y), None

    (t, y), _ = lax.scan(body, (t0, y0), None, length=steps)
    return t, y
