"""Hardware A/B for the manual DMA ring (MEDSEG_MANUAL_FETCH / MEDSEG_UP_DIRECT).

Run twice (the knobs are read at trace time — fresh process per config):

    MEDSEG_MANUAL_FETCH=0 python benchmarks/ab_manual.py save
    MEDSEG_MANUAL_FETCH=1 python benchmarks/ab_manual.py cmp
    MEDSEG_MANUAL_FETCH=1 MEDSEG_UP_DIRECT=0 python benchmarks/ab_manual.py cmp

`save` writes the pp/flat_k16 serving output (the layout the zrow pipeline
consumes) to /tmp/ab_manual_ref.npz; `cmp` loads and reports max-abs /
rel diff plus argmax agreement. Both modes print chained device time.
"""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_medseg"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import numpy as np

MODE = sys.argv[1] if len(sys.argv) > 1 else "cmp"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
S = 96
K = 30
REF = "/tmp/ab_manual_ref.npz"


def sync1(x):
    return float(np.asarray(jax.lax.slice(x.ravel(), (0,), (1,))))


def main():
    from medseg.kernels import unetr_of
    from medseg.models.unetr import unetr_b16

    print(
        f"devices={jax.devices()} B={B} S={S} "
        f"MANUAL={os.environ.get('MEDSEG_MANUAL_FETCH', '0')} "
        f"UP_DIRECT={os.environ.get('MEDSEG_UP_DIRECT', '1')}",
        file=sys.stderr, flush=True,
    )
    model = unetr_b16(in_channels=1, out_channels=14, crop_size=S, dtype=jnp.bfloat16)
    x = 0.3 + 0.1 * jax.random.normal(jax.random.key(1), (B, S, S, S, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), x)

    fwd = jax.jit(
        lambda pp, xx: unetr_of.fast_apply_v3(model, pp, xx, pp=True, flat_k16=True)
    )
    out = fwd(params, x)
    sync1(out)
    got = np.asarray(out, np.float32)
    print(f"out shape {got.shape} dtype {out.dtype}", flush=True)

    if MODE == "save":
        np.savez_compressed(REF, out=got.astype(np.float16))
        print(f"saved ref -> {REF}", flush=True)
    else:
        ref = np.load(REF)["out"].astype(np.float32)
        d = np.abs(got - ref)
        scale = np.abs(ref).max()
        # argmax agreement over the K16 class lanes: pp layout is
        # (B, D, 4, H/2, (W/2)*16) with 16 = padded class dim fastest
        ga = got.reshape(*got.shape[:-1], -1, 16).argmax(-1)
        ra = ref.reshape(*ref.shape[:-1], -1, 16).argmax(-1)
        agree = float((ga == ra).mean())
        print(
            f"maxabs {d.max():.4e}  rel {d.max() / scale:.4e}  "
            f"argmax agree {agree * 100:.3f}%", flush=True,
        )

    # chained timing
    def loop(pp, xx):
        def body(c, _):
            o = fwd_inner(pp, c)
            probe = (0.0 * o.ravel()[0]).astype(c.dtype)
            return c + probe, ()
        fin, _ = jax.lax.scan(body, xx, None, length=K)
        return fin

    fwd_inner = lambda pp, xx: unetr_of.fast_apply_v3(model, pp, xx, pp=True, flat_k16=True)
    fn = jax.jit(loop)
    sync1(fn(params, x))
    t0 = time.perf_counter(); sync1(fn(params, x))
    ms = (time.perf_counter() - t0) / K * 1e3
    print(f"fast_apply_v3 pp/flat_k16 B={B}: {ms:.2f} ms/call ({ms / B:.3f} ms/window)", flush=True)


if __name__ == "__main__":
    main()
