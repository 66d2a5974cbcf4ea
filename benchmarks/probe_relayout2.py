"""Round-5 re-probe of the Mosaic relayout wall (round-3c findings):
(a) 2-D sublane<->lane transpose, (b) transposed-lhs dot_general,
(c) lane-fold reshape (9216,16)->(1152,128), (d) (16,LO)->(LO,16) via
dot_general with identity. Each compiled standalone on the real chip."""
import sys, traceback
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def try_case(name, kern, x_shapes, out_shape, dtype=jnp.float32):
    try:
        xs = [jnp.asarray(np.random.default_rng(0).normal(size=s), dtype) for s in x_shapes]
        f = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct(out_shape, dtype))
        out = jax.jit(f)(*xs)
        v = float(np.asarray(out.ravel()[0]))
        print(f"{name}: OK ({v:.3f})")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return False

# (a) plain 2-D transpose in VMEM
def k_t(x_ref, o_ref):
    o_ref[...] = x_ref[...].T
try_case("transpose(16,9216)->(9216,16)", k_t, [(16, 9216)], (9216, 16))

# (b) transposed-lhs dot_general: (C,LO)^T @ (C,CO) -> (LO,CO)
def k_dg(x_ref, w_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
try_case("dot_general lhsT (16,9216)x(16,16)->(9216,16)", k_dg, [(16, 9216), (16, 16)], (9216, 16))

# (c) lane-fold reshape
def k_r(x_ref, o_ref):
    o_ref[...] = x_ref[...].reshape(1152, 128)
try_case("reshape (9216,16)->(1152,128)", k_r, [(9216, 16)], (1152, 128))

# (c2) reshape minor-merge (192,48,16)->(192,768)
def k_r2(x_ref, o_ref):
    o_ref[...] = x_ref[...].reshape(192, 768)
try_case("reshape (192,48,16)->(192,768)", k_r2, [(192, 48, 16)], (192, 768))

# (d) full out-head shape: matmul to (LO, CO) then store
def k_big(x_ref, w_ref, o_ref):
    m = jax.lax.dot_general(x_ref[...], w_ref[...], (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[...] = m.reshape(192, 768)
try_case("lhsT-dot + reshape -> (192,768)", k_big, [(16, 9216), (16, 16)], (192, 768))
