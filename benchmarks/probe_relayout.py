"""Mosaic in-kernel relayout microprobes (decides two serving-glue fixes).

(A) out-head K16-minor: transposed dot_general (contract lhs dim 0) ->
    (LO, 16) fp32 -> reshape (LO/48, 768) -> bf16 write, vs the current
    (16, LO) dot + XLA swapaxes copy (copy.976 = 33 ms/vol in the trace).
(B) dec3 up interleave: 4 plane groups (32, 576) -> compact-zip (32, 2304)
    in VMEM, vs the XLA 8-D interleave copy (copy.965 = 34 ms/vol at
    125 GB/s).

Numerics are asserted against the XLA formulation; timing is a chained
loop (feedback carry) minus nothing — stage >> RTT at K=100 reps.
"""
import functools, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_medseg"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, Z = 6, 96
LO = 9216  # 4 * 48 * 48
KCH = 100


def sync1(x):
    return float(np.asarray(x[(0,) * x.ndim]))


def chain(fn, x, *rest):
    @jax.jit
    def loop(x, *rest):
        def body(c, _):
            o = fn(c, *rest)
            probe = (0.0 * o.reshape(-1)[0]).astype(c.dtype)
            return c + probe, ()
        fin, _ = jax.lax.scan(body, x, None, length=KCH)
        return fin
    sync1(loop(x, *rest))
    t0 = time.perf_counter(); sync1(loop(x, *rest))
    return (time.perf_counter() - t0) / KCH * 1e3


# ---------------- A: out-head direct K16-minor ----------------

def _head_base_kernel(c_ref, k_ref, o_ref):
    # current form: (16, 17) x (17, LO) -> (16, LO)
    v = jnp.dot(k_ref[...], c_ref[0].astype(jnp.float32),
                preferred_element_type=jnp.float32)
    o_ref[...] = v[None].astype(o_ref.dtype)


def _head_t_kernel(c_ref, k_ref, o_ref):
    # transposed: contract lhs dim 0 -> (LO, 16), fold 8 sublanes into lanes
    # -> (LO/8, 128). Rows (p, hh, ww//8), lanes (ww%8, co): the row-major
    # flatten to (4, 48, 768) is a FREE XLA reshape of this output.
    # ((LO,16) -> (LO/48, 768) directly crashes Mosaic: tpu.reshape INTERNAL.)
    comb = c_ref[0].astype(jnp.float32)  # (17, LO)
    kt = k_ref[...].astype(jnp.float32)  # (17, 16)
    vt = jax.lax.dot_general(
        comb, kt, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (LO, 16)
    o_ref[...] = vt.reshape(LO // 8, 128)[None].astype(o_ref.dtype)


def head_probe():
    comb = jax.random.normal(jax.random.key(0), (B * Z, 17, LO), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (16, 17), jnp.bfloat16)
    kt = k.T.copy()

    base = pl.pallas_call(
        _head_base_kernel,
        grid=(B * Z,),
        in_specs=[pl.BlockSpec((1, 17, LO), lambda i: (i, 0, 0)),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 16, LO), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * Z, 16, LO), jnp.bfloat16),
    )
    tker = pl.pallas_call(
        _head_t_kernel,
        grid=(B * Z,),
        in_specs=[pl.BlockSpec((1, 17, LO), lambda i: (i, 0, 0)),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, LO // 8, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * Z, LO // 8, 128), jnp.bfloat16),
    )

    # numerics: tker == base transposed+reshaped
    vb = jax.jit(lambda c: base(c, k))(comb)
    vt = jax.jit(lambda c: tker(c, kt))(comb)
    want = jnp.swapaxes(vb, 1, 2).reshape(B * Z, LO // 8, 128)
    err = float(jnp.max(jnp.abs(vt.astype(jnp.float32) - want.astype(jnp.float32))))
    print(f"A numerics maxabs {err:.3e}")

    t_base = chain(lambda c: base(c, k), comb)
    t_t = chain(lambda c: tker(c, kt), comb)
    # the XLA copy the base path additionally pays:
    t_xla = chain(lambda v: jnp.swapaxes(v, 1, 2).reshape(B * Z, LO // 8, 128), vb)
    print(f"A base dot kernel      {t_base:7.3f} ms")
    print(f"A transposed+reshape   {t_t:7.3f} ms")
    print(f"A XLA swapaxes copy    {t_xla:7.3f} ms  (base total {t_base + t_xla:.3f})")


# ---------------- B: dec3 compact zip ----------------

def _zip_kernel(x_ref, o_ref):
    v = x_ref[0]  # (32, 2304) lanes grouped [ (j,l) plane (24x24) ] * 4
    v5 = v.reshape(32, 2, 2, 24, 24)  # (c, j, l, h, w)
    o_ref[...] = v5.transpose(0, 3, 1, 4, 2).reshape(32, 2304)[None]


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def zip_probe():
    n = B * Z  # stand-in row count (dec3 is 48 z-rows but 2x batch; same bytes)
    x = jax.random.normal(jax.random.key(2), (n, 32, 2304), jnp.bfloat16)

    zipk = pl.pallas_call(
        _zip_kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, 32, 2304), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, 32, 2304), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 32, 2304), jnp.bfloat16),
    )
    copyk = pl.pallas_call(
        _copy_kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, 32, 2304), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, 32, 2304), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 32, 2304), jnp.bfloat16),
    )

    got = jax.jit(zipk)(x)
    want = jax.jit(
        lambda x: x.reshape(n, 32, 2, 2, 24, 24)
        .transpose(0, 1, 4, 2, 5, 3)
        .reshape(n, 32, 2304)
    )(x)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
    print(f"B numerics maxabs {err:.3e}")

    t_zip = chain(zipk, x)
    t_copy = chain(copyk, x)
    t_xla = chain(
        lambda x: x.reshape(n, 32, 2, 2, 24, 24)
        .transpose(0, 1, 4, 2, 5, 3)
        .reshape(n, 32, 2304),
        x,
    )
    print(f"B in-kernel zip        {t_zip:7.3f} ms")
    print(f"B plain kernel copy    {t_copy:7.3f} ms  (zip overhead {t_zip - t_copy:.3f})")
    print(f"B XLA interleave copy  {t_xla:7.3f} ms")


if __name__ == "__main__":
    print(f"devices {jax.devices()}", file=sys.stderr, flush=True)
    head_probe()
    zip_probe()
