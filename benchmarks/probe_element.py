"""Pin down pl.Element halo-fetch semantics: fetch zb+2 rows per grid step
with element offsets zb*t-1 (OOB at both ends, padding=(1,1)), compare with
the expected gather, then time the DMA traffic win on TPU vs the 3-stream
fetch pattern used by conv_of.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_medseg"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

interpret = os.environ.get("INTERP", "0") == "1"

B, D, C, LO = 2, 8, 8, 256
ZB = 2


def kern(x_ref, o_ref):
    # x_ref: (1, ZB+2, C, LO) halo rows for out block (1, ZB, C, LO)
    o_ref[...] = x_ref[:, 1 : 1 + ZB] * 2.0


def run(x):
    nzb = D // ZB
    return pl.pallas_call(
        kern,
        grid=(B, nzb),
        in_specs=[
            pl.BlockSpec(
                (pl.Blocked(1), pl.Element(ZB + 2, (1, 1)), pl.Blocked(C), pl.Blocked(LO)),
                lambda bb, z: (bb, z * ZB - 1, 0, 0),
            )
        ],
        out_specs=pl.BlockSpec((1, ZB, C, LO), lambda bb, z: (bb, z, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, D, C, LO), x.dtype),
        interpret=interpret,
    )(x)


def main():
    x = jnp.arange(B * D * C * LO, dtype=jnp.float32).reshape(B, D, C, LO)
    out = run(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0)
    print("semantics OK: center rows land at the right z", flush=True)

    # element-offset fetch with index map z*ZB (no OOB): check padding coords
    def kern2(x_ref, o_ref):
        o_ref[...] = x_ref[:, 1 : 1 + ZB] * 2.0

    out2 = pl.pallas_call(
        kern2,
        grid=(B, D // ZB),
        in_specs=[
            pl.BlockSpec(
                (pl.Blocked(1), pl.Element(ZB + 2, (1, 1)), pl.Blocked(C), pl.Blocked(LO)),
                lambda bb, z: (bb, z * ZB - 1, 0, 0),
            )
        ],
        out_specs=pl.BlockSpec((1, ZB, C, LO), lambda bb, z: (bb, z, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, D, C, LO), x.dtype),
        interpret=interpret,
    )(x)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(x) * 2.0)
    print("second variant OK", flush=True)


if __name__ == "__main__":
    main()
