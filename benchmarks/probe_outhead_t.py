"""A/B the transposed out-head (kernel emits the ppk K-minor window form
directly) vs the round-3 path (K-major kernel + XLA swapaxes exit copy).
Run on the real chip. Round-5 serving item 2a (VERDICT)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from medseg.kernels.conv_of import DPAD, outhead_of

B, D, H, W = 8, 96, 96, 96
C, CO = 16, 16
SEG = (H // 2) * (W // 2)
LO = 4 * SEG

rng = np.random.default_rng(0)
z = jnp.asarray(rng.normal(size=(B, D + 2 * DPAD, C, LO)), jnp.bfloat16)
res = jnp.asarray(rng.normal(size=(B, D + 2 * DPAD, C, LO)), jnp.bfloat16)
az, bz, ar, br = (
    jnp.asarray(rng.normal(size=(B, C, 1)), jnp.float32) for _ in range(4)
)
kout = jnp.asarray(rng.normal(size=(CO, C)), jnp.bfloat16)
bias = jnp.asarray(rng.normal(size=(CO, 1)), jnp.float32)
scale = jnp.asarray(
    rng.uniform(0.1, 1.0, size=(B, D + 2 * DPAD, 1, LO)), jnp.float32
)


@jax.jit
def old(z, res, scale):
    o = outhead_of(z, res, az, bz, ar, br, kout, bias, scale,
                   out_dtype=jnp.bfloat16)
    return o.swapaxes(2, 3).reshape(B, D, 4, H // 2, (W // 2) * CO)


@jax.jit
def new(z, res, scale):
    o = outhead_of(z, res, az, bz, ar, br, kout, bias, scale,
                   out_dtype=jnp.bfloat16, transposed=True)
    return o.reshape(B, D, 4, H // 2, (W // 2) * CO)


a = np.asarray(old(z, res, scale), np.float32)
b = np.asarray(new(z, res, scale), np.float32)
err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
print(f"rel err old vs new: {err:.2e}")

for name, f in [("old(swapaxes)", old), ("new(transposed)", new)]:
    f(z, res, scale).block_until_ready()
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(z, res, scale)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name}: {dt:.3f} ms/call (batch {B})")


# z-packed variant: full 128-lane tile stores (zpack = 128 // CO = 8)
@jax.jit
def zpk(z, res, scale):
    o = outhead_of(z, res, az, bz, ar, br, kout, bias, scale,
                   out_dtype=jnp.bfloat16, transposed=True, zpack=8)
    return o.reshape(B, D // 8, 4, H // 2, (W // 2) * 8 * CO)


c = np.asarray(zpk(z, res, scale), np.float32)
# unpack to the unpacked ppk form for comparison
cu = c.reshape(B, D // 8, 4, H // 2, W // 2, 8, CO)
cu = cu.transpose(0, 1, 5, 2, 3, 4, 6).reshape(B, D, 4, H // 2, (W // 2) * CO)
err_z = np.max(np.abs(a - cu)) / (np.max(np.abs(a)) + 1e-9)
print(f"rel err old vs zpk: {err_z:.2e}")
zpk(z, res, scale).block_until_ready()
import time as _t
t0 = _t.perf_counter()
for _ in range(30):
    out = zpk(z, res, scale)
out.block_until_ready()
print(f"zpk(transposed,packed): {(_t.perf_counter()-t0)/30*1e3:.3f} ms/call (batch {B})")
