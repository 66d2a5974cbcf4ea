"""Pallas conv kernel tests (interpret mode on the CPU test platform).

The TPU fast path for UNETR's full-resolution 3x3x3 convs
(medseg/kernels/conv3d.py) must be numerically identical to the XLA conv it
replaces; the interpreter executes the same kernel logic on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medseg.kernels.conv3d import (
    _pallas_conv,
    _xla_conv,
    conv3x3x3,
    flat_supported,
    from_flat,
    to_flat,
)

TOL = dict(rtol=1e-5, atol=1e-5)


def test_flat_layout_roundtrip(rng):
    from medseg.kernels.conv3d import _wp

    wp = _wp(8)  # 64 since round 2: W+2 <= 64 packs two y-rows per vreg
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 8, 16)).astype(np.float32))
    flat = to_flat(x)
    assert flat.shape == (2, 6, 16, 10 * wp)
    # conv-output layout differs only by the z/y halos; emulate it
    back = from_flat(
        flat[:, 1:-1].reshape(2, 4, 16, 10, wp)[:, :, :, 1:-1].reshape(2, 4, 16, 8 * wp),
        8,
        8,
    )
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


@pytest.mark.parametrize("shape,co", [((1, 6, 8, 8, 16), 16), ((2, 4, 8, 16, 8), 16)])
def test_pallas_conv_matches_xla_interpret(rng, shape, co):
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, shape[-1], co)).astype(np.float32) * 0.1)
    ref = _xla_conv(x, k)
    got = _pallas_conv(x, k, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **TOL)


def test_conv3x3x3_cpu_path_and_grads(rng):
    """On CPU the public op routes to XLA; gradients flow via custom_vjp."""
    x = jnp.asarray(rng.normal(size=(1, 4, 8, 8, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 8, 8)).astype(np.float32) * 0.1)
    out = conv3x3x3(x, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_xla_conv(x, k)), **TOL)

    def loss(x, k):
        return jnp.sum(conv3x3x3(x, k) ** 2)

    gx, gk = jax.grad(loss, argnums=(0, 1))(x, k)

    def loss_ref(x, k):
        return jnp.sum(_xla_conv(x, k) ** 2)

    gx_ref, gk_ref = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), **TOL)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref), **TOL)


def test_flat_supported_gating():
    assert flat_supported((8, 96, 96, 96, 16), 16)
    # 128^3 folds to 256 lanes/row (51% occupancy) — currently routed to XLA
    # until the kernel is profiled at that occupancy
    assert not flat_supported((1, 128, 128, 128, 16), 16)
    assert not flat_supported((1, 96, 96, 96, 1), 16)  # C=1 unaligned
    assert not flat_supported((1, 96, 96, 96, 16), 13)  # CO unaligned
