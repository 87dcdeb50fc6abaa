"""Probe the 4-D slot-folded layout: stacked (6, Z, R, 128), slot via
dynamic pl.ds on the leading (variable) dim."""
import sys; sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def probe(tag, Z, R, bz, n_in=4, with_eps_out=True):
    print(f"RUN {tag}: Z={Z} R={R} bz={bz} n_in={n_in}", file=sys.stderr, flush=True)
    L = 128
    kshape = (3, Z, R, L)
    nb = Z // bz

    def kernel(cur_ref, *refs):
        ins = refs[:n_in]
        outs = refs[n_in:n_in + (2 if with_eps_out else 1)]
        scratch = refs[-(n_in + 2):-1]
        sems = refs[-1]
        i = pl.program_id(0)
        cur = cur_ref[0]
        cps = []
        for a in range(n_in):
            src = (ins[0].at[pl.ds(cur * 3, 3), pl.ds(i * bz, bz)] if a == 0
                   else ins[a].at[:, pl.ds(i * bz, bz)])
            cps.append(pltpu.make_async_copy(src, scratch[a], sems.at[a]))
        for c in cps: c.start()
        for c in cps: c.wait()
        acc = scratch[0][:]
        for a in range(1, n_in):
            acc = acc + scratch[a][:]
        if with_eps_out:
            outs[1][:] = jnp.broadcast_to(jnp.max(jnp.abs(acc)), outs[1].shape)
        ybuf = scratch[n_in]
        ybuf[:] = acc * 2.0
        cp = pltpu.make_async_copy(
            ybuf, outs[0].at[pl.ds((1 - cur) * 3, 3), pl.ds(i * bz, bz)],
            sems.at[n_in])
        cp.start(); cp.wait()

    out_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
    out_shapes = [jax.ShapeDtypeStruct((6,) + kshape[1:], jnp.float32)]
    if with_eps_out:
        out_specs.append(pl.BlockSpec((1, 8, L), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((nb, 8, L), jnp.float32))
    f = pl.pallas_call(
        kernel, grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.ANY)] * n_in,
        out_specs=out_specs, out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((3, bz, R, L), jnp.float32)
                        for _ in range(n_in + 1)]
        + [pltpu.SemaphoreType.DMA((n_in + 1,))],
        input_output_aliases={1: 0},
    )
    w2 = jnp.concatenate([jnp.zeros(kshape), jnp.ones(kshape)], axis=0)
    ks = [jnp.full(kshape, 0.5) for _ in range(n_in - 1)]
    outs = f(jnp.asarray([1], jnp.int32), w2, *ks)
    y2 = outs[0]
    got = float(jnp.max(y2[:3]))
    want = 2.0 * (1.0 + 0.5 * (n_in - 1))
    passthrough = float(jnp.min(y2[3:])), float(jnp.max(y2[3:]))
    print(f"  OK {tag}: max={got} want={want} passthrough={passthrough}",
          file=sys.stderr, flush=True)

print("health:", float(jnp.sum(jnp.ones((8,)))), file=sys.stderr, flush=True)
probe("B4-R79-minimal", Z=16, R=79, bz=4, n_in=1, with_eps_out=False)
probe("D4-R79-4in-eps", Z=16, R=79, bz=4, n_in=4)
probe("F4-MR-shape", Z=200, R=79, bz=8, n_in=4)
print("ALL PROBES PASSED", file=sys.stderr, flush=True)
