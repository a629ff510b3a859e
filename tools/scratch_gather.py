"""Probe: per-element dynamic gather along lanes inside a Pallas TPU kernel."""
import sys
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

which = sys.argv[1] if len(sys.argv) > 1 else "take"


def run(kern, shapes, outshape):
    f = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in shapes],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(outshape, jnp.float32))
    rng = np.random.default_rng(0)
    args = []
    for s, dt in shapes:
        if dt == jnp.float32:
            args.append(jnp.asarray(rng.random(s, np.float32)))
        else:
            args.append(jnp.asarray(
                rng.integers(0, s[-1], s).astype(np.int32)))
    out = f(*args)
    jax.block_until_ready(out)
    # verify vs numpy
    x, idx = np.asarray(args[0]), np.asarray(args[1])
    want = np.take_along_axis(x, idx, axis=-1)
    got = np.asarray(out)
    print("OK", which, "max err", np.abs(want - got).max())


if which == "take":
    # per-element gather along the lane axis, 2-D
    def kern(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=-1)
    run(kern, [((8, 128), jnp.float32), ((8, 128), jnp.int32)], (8, 128))
elif which == "take3d":
    # 3-D: gather along lanes with leading batch dims
    def kern(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=-1)
    run(kern, [((4, 16, 128), jnp.float32), ((4, 16, 128), jnp.int32)],
        (4, 16, 128))
elif which == "dyng":
    from jax.experimental.pallas import tpu as pt
    print([n for n in dir(pt) if "gather" in n.lower()])
