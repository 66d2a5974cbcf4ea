"""Round-5 debug: z-packed zrow pipeline at reduced volume sizes to
localize the RESOURCE_EXHAUSTED seen at the 512x512x160 headline shape."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_medseg"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from medseg.kernels.unetr_of import fast_apply_v3, serving_gelu_approx
from medseg.models.unetr import unetr_b16
from medseg.ops.sliding_window import SlidingWindowSpec
from medseg.ops import swi_zrow

ROI, K = 96, 14
shape = tuple(int(s) for s in os.environ.get("ZPDBG_SHAPE", "256,256,96").split(","))

model = unetr_b16(1, K, ROI, dtype=jnp.bfloat16)
params = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, ROI, ROI, ROI, 1)))
gelu = serving_gelu_approx()

def apply_fn(p, windows, wgt, zpack=1, w_fold=None):
    return fast_apply_v3(model, p, windows, flat_k16=True, out_scale=wgt,
                         pp=True, gelu_approx=gelu, zpack=zpack, w_fold=w_fold)

spec = SlidingWindowSpec(roi=(ROI,)*3, overlap=0.5, mode="gaussian")
vol = 0.3 + 0.2*jax.random.normal(jax.random.key(1), shape + (1,), jnp.float32)
t0 = time.perf_counter()
out = swi_zrow.sliding_window_inference_zrow(params, vol, apply_fn, K, spec)
v = float(np.asarray(out[0,0,0,0]))
print(f"shape {shape}: ok ({v:.4f}) compile+run {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
out = swi_zrow.sliding_window_inference_zrow(params, vol, apply_fn, K, spec)
float(np.asarray(out[0,0,0,0]))
print(f"warm {time.perf_counter()-t0:.3f}s", flush=True)
