"""R=80 (8-aligned rows): does it fix the dynamic leading-dim DMA fault?
Tests both the 5-D (2,3,Z,R,128) and 4-D-folded (6,Z,R,128) layouts."""
import sys; sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def probe5d(tag, Z, R, bz, n_in=4):
    print(f"RUN5D {tag}: Z={Z} R={R} bz={bz} n_in={n_in}", file=sys.stderr, flush=True)
    L = 128
    kshape = (3, Z, R, L)
    nb = Z // bz
    def kernel(cur_ref, *refs):
        ins = refs[:n_in]
        outs = refs[n_in:n_in + 2]
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
        outs[1][:] = jnp.broadcast_to(jnp.max(jnp.abs(acc)), outs[1].shape)
        ybuf = scratch[n_in]
        ybuf[:] = acc * 2.0
        cp = pltpu.make_async_copy(ybuf, outs[0].at[1 - cur, :, pl.ds(i * bz, bz)],
                                   sems.at[n_in])
        cp.start(); cp.wait()
    f = pl.pallas_call(
        kernel, grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.ANY)] * n_in,
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec((1, 8, L), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((2,) + kshape, jnp.float32),
                   jax.ShapeDtypeStruct((nb, 8, L), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((3, bz, R, L), jnp.float32)
                        for _ in range(n_in + 1)]
        + [pltpu.SemaphoreType.DMA((n_in + 1,))],
        input_output_aliases={1: 0},
    )
    w2 = jnp.stack([jnp.zeros(kshape), jnp.ones(kshape)])
    ks = [jnp.full(kshape, 0.5) for _ in range(n_in - 1)]
    y2, _eps = f(jnp.asarray([1], jnp.int32), w2, *ks)
    got = float(jnp.max(y2[0]))
    print(f"  OK5D {tag}: max={got} want={2.0*(1.0+0.5*(n_in-1))}",
          file=sys.stderr, flush=True)

print("health:", float(jnp.sum(jnp.ones((8,)))), file=sys.stderr, flush=True)
probe5d("R80-minimal", Z=16, R=80, bz=4, n_in=1)
probe5d("R80-MR", Z=200, R=80, bz=8, n_in=4)
probe5d("R16-LR-like", Z=100, R=16, bz=4, n_in=4)
probe5d("R320-HR-like", Z=400, R=320, bz=8, n_in=4)
print("ALL PROBES PASSED", file=sys.stderr, flush=True)
