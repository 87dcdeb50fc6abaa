"""Minimal repro matrix for the attempt-pipeline TPU abort.
Each step prints BEFORE running so the wedge point is identifiable."""
import sys; sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def probe(tag, Z, R, bz, with_eps_out=True, n_in=4):
    print(f"RUN {tag}: Z={Z} R={R} bz={bz} eps_out={with_eps_out} n_in={n_in}",
          file=sys.stderr, flush=True)
    L = 128
    kshape = (3, Z, R, L)
    nb = Z // bz

    def kernel(cur_ref, *refs):
        ins = refs[:n_in]          # w2 + (n_in-1) K arrays
        outs = refs[n_in:n_in + (2 if with_eps_out else 1)]
        scratch = refs[-(n_in + 2):-1]
        sems = refs[-1]
        i = pl.program_id(0)
        cur = cur_ref[0]
        cps = []
        for a in range(n_in):
            src = (ins[0].at[cur, :, pl.ds(i * bz, bz)] if a == 0
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
        cp = pltpu.make_async_copy(ybuf, outs[0].at[1 - cur, :, pl.ds(i * bz, bz)],
                                   sems.at[n_in])
        cp.start(); cp.wait()

    out_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
    out_shapes = [jax.ShapeDtypeStruct((2,) + kshape, jnp.float32)]
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
    w2 = jnp.stack([jnp.zeros(kshape), jnp.ones(kshape)])
    ks = [jnp.full(kshape, 0.5) for _ in range(n_in - 1)]
    outs = f(jnp.asarray([1], jnp.int32), w2, *ks)
    y2 = outs[0] if with_eps_out else outs
    got = float(jnp.max(y2[0]))
    want = 2.0 * (1.0 + 0.5 * (n_in - 1))
    print(f"  OK {tag}: max={got} want={want}", file=sys.stderr, flush=True)

print("health:", float(jnp.sum(jnp.ones((8,)))), file=sys.stderr, flush=True)
probe("A-small-likeprobe3", Z=8, R=8, bz=2, with_eps_out=False, n_in=1)
probe("B-R79-minimal", Z=16, R=79, bz=4, with_eps_out=False, n_in=1)
probe("C-R79-4in", Z=16, R=79, bz=4, with_eps_out=False, n_in=4)
probe("D-R79-4in-eps", Z=16, R=79, bz=4, with_eps_out=True, n_in=4)
probe("E-R80-4in-eps", Z=16, R=80, bz=4, with_eps_out=True, n_in=4)
probe("F-MR-shape", Z=200, R=79, bz=8, with_eps_out=True, n_in=4)
print("ALL PROBES PASSED", file=sys.stderr, flush=True)
