"""Per-stage kernel microbenchmark: times each fused Merson stage kernel
in isolation on the attached device and compares against the HBM traffic
bound, to locate the compute/bandwidth crossover.

Usage: python scripts/kernel_microbench.py [--grid-nodes 200] [--iters 50]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid-nodes", type=int, default=200)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--bw", type=float, default=600e9,
                    help="assumed HBM bandwidth for the bound column")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from porousfreezethaw_tpu.cases import freezing_params_text
    from porousfreezethaw_tpu.config import parse_param_file
    from porousfreezethaw_tpu.core.grid import GridGeometry
    from porousfreezethaw_tpu.models.freezing import (
        FreezingParams, shift_temperature_origin)
    from porousfreezethaw_tpu.ops.pallas.stencil import (
        make_fused_stage, pad_state, padded_shape)

    pf = parse_param_file(freezing_params_text(grid_nodes=args.grid_nodes),
                          env={"OUTPUT": "/tmp"})
    prm = FreezingParams.from_dict(pf.vars)
    geom = GridGeometry(pf.vars["L1"], pf.vars["L2"], pf.vars["L3"],
                        int(pf.vars["n1"]), int(pf.vars["n2"]),
                        int(pf.vars["n3"]))
    prm = shift_temperature_origin(prm, prm.u_star)
    stage = make_fused_stage(geom, prm, calc_mode=0)
    from porousfreezethaw_tpu.ops.pallas.stencil import padded_k_shape
    kshape = padded_k_shape(geom)
    nbytes = int(np.prod(padded_shape(geom))) * 4
    vb = nbytes // 3   # bytes of one variable's planes
    print(f"grid {geom.n1}x{geom.n2}x{geom.n3}, state {nbytes/2**20:.1f} MiB",
          file=sys.stderr)

    rng = np.random.RandomState(0)
    w = pad_state(jnp.asarray(np.stack([
        5.0 * rng.standard_normal(geom.shape),
        rng.random_sample(geom.shape),
        rng.random_sample(geom.shape) * 0.5]), jnp.float32), geom)
    k = [jnp.asarray(0.01 * rng.standard_normal(kshape), jnp.float32)
         for _ in range(4)]

    # each case takes (w, t): the per-iteration t defeats CSE inside the
    # timing loop (kernels on one core serialize regardless)
    cases = {
        "K1 (nk=0)": lambda w_, t: stage(t, 1e-6, w_, []),
        "K2 (nk=1)": lambda w_, t: stage(t, 1e-6, w_, [(1 / 3, k[0])]),
        "K3 (nk=2)": lambda w_, t: stage(t, 1e-6, w_,
                                         [(1 / 6, k[0]), (1 / 6, k[1])]),
        "K4 (nk=2)": lambda w_, t: stage(t, 1e-6, w_,
                                         [(1 / 8, k[0]), (3 / 8, k[2])]),
        "K5 plain (nk=3)": lambda w_, t: stage(
            t, 1e-6, w_, [(0.5, k[0]), (-1.5, k[2]), (2.0, k[3])]),
        "stage5 fused tail": lambda w_, t: stage.stage5(
            t, 1e-6, w_, [(0.5, k[0]), (-1.5, k[2]), (2.0, k[3])])[0],
    }
    # minimum HBM traffic in single-variable planes: w is 3 vars, every K
    # read/write is 2 (gl static)
    traffic = {
        "K1 (nk=0)": 5 * vb,
        "K2 (nk=1)": 7 * vb,
        "K3 (nk=2)": 9 * vb,
        "K4 (nk=2)": 9 * vb,
        "K5 plain (nk=3)": 11 * vb,
        "stage5 fused tail": 11 * vb,  # y_spec write, no K5 (eps negligible)
    }

    def chain(fn):
        # serialize iters dependent executions: each iteration's t reads
        # one element of the previous output, so the chain cannot be
        # reordered or CSE'd and costs nothing beyond the kernel itself
        def run(w_):
            from jax import lax

            def body(i, acc):
                t = 1e-12 * acc.reshape(-1)[0]
                return fn(w_, t)
            return lax.fori_loop(0, args.iters, body, fn(w_, 0.0))
        return jax.jit(run)

    print(f"{'kernel':20s} {'ms':>8s} {'GB/s eff':>9s} {'bound ms':>9s} "
          f"{'% of bound':>10s}")
    for name, fn in cases.items():
        f = chain(fn)
        out = f(w)
        float(jnp.sum(out))  # sync
        t0 = time.time()
        out = f(w)
        float(jnp.sum(out))
        dt = (time.time() - t0) / args.iters
        tb = traffic[name] / args.bw
        print(f"{name:20s} {dt*1e3:8.3f} {traffic[name]/dt/1e9:9.1f} "
              f"{tb*1e3:9.3f} {100*tb/dt:9.1f}%")


if __name__ == "__main__":
    main()
