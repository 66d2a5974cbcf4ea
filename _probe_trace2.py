"""Trace ONE whole-volume SWI (bench config) and aggregate device time."""
import os, glob
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_medseg"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from medseg.models.unetr import unetr_b16
from medseg.ops.sliding_window import SlidingWindowSpec, sliding_window_inference
from medseg.kernels.unetr_of import fast_apply_v3

model = unetr_b16(1, 14, 96, dtype=jnp.bfloat16)
params = jax.jit(model.init)(jax.random.key(0), jnp.zeros((8, 96, 96, 96, 1), jnp.float32))
spec = SlidingWindowSpec(roi=(96,)*3, overlap=0.5, sw_batch=8, mode="gaussian")
volume = 0.3 + 0.2 * jax.random.normal(jax.random.key(1), (512, 512, 160, 1), jnp.float32)

def apply_fn(p, w):
    return fast_apply_v3(model, p, w, flat_k16=True)

def run():
    return sliding_window_inference(params, volume, apply_fn, 14, spec, out_layout="flatk")

out = run()
print(float(np.asarray(out[0, 0, 0, 0])), flush=True)
jax.profiler.start_trace("/tmp/trace_swi")
out = run()
print(float(np.asarray(out[0, 0, 0, 0])), flush=True)
jax.profiler.stop_trace()
print("\n".join(glob.glob("/tmp/trace_swi/**/*.json.gz", recursive=True)), flush=True)
