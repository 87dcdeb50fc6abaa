import sys; sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
from porousfreezethaw_tpu.core.grid import GridGeometry
from porousfreezethaw_tpu.ops.pallas.stencil import (
    make_fused_attempt, make_fused_stage, pad_state, padded_shape)
from tests.test_freezing_equation import default_params

prm = default_params()

def case(n1, n2, n3, bz):
    geom = GridGeometry(0.03, 0.03, 0.06, n1, n2, n3)
    rng = np.random.RandomState(3)
    w = jnp.asarray(np.stack([
        273.15 + 10 * (rng.random_sample(geom.shape) - 0.5),
        rng.random_sample(geom.shape),
        rng.random_sample(geom.shape) * 0.6]), jnp.float32)
    wp = pad_state(w, geom)
    att = make_fused_attempt(geom, prm, 0, bz=bz)
    @jax.jit
    def one(wp):
        (y2, cur), eps = att.attempt(0.0, 1e-6, att.pack(wp))
        return y2, eps
    y2, eps = one(wp)
    ok = bool(jnp.all(jnp.isfinite(y2))) 
    print(f"n1={n1} n2={n2} n3={n3} bz={bz} shape={padded_shape(geom)}: "
          f"eps={float(jnp.max(eps)):.3e} finite={ok}", file=sys.stderr, flush=True)

print("health:", float(jnp.sum(jnp.ones((8,)))), file=sys.stderr, flush=True)
# 1. odd R (100x100 plane -> R=79), small Z
case(100, 100, 16, 4)
