"""Parity tests for the of-form training conv routing (conv3d.TRAIN_CONV).

The routed path (fwd + bwd-data through the Pallas of-form halo kernel,
filter-grad as one explicit conv) must match the XLA oracle in values and
gradients. Pallas runs in interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import medseg.kernels.conv3d as conv3d
from medseg.kernels.conv3d import _conv_dk, _conv_dx, _of_conv, _xla_conv

B, D, S, CI, CO = 1, 4, 48, 8, 8


@pytest.fixture
def data():
    kx, kk, kg = jax.random.split(jax.random.key(7), 3)
    x = jax.random.normal(kx, (B, D, S, S, CI), jnp.float32)
    kern = jax.random.normal(kk, (3, 3, 3, CI, CO), jnp.float32) * 0.2
    g = jax.random.normal(kg, (B, D, S, S, CO), jnp.float32)
    return x, kern, g


def test_of_conv_fwd_matches_xla(data):
    x, kern, _ = data
    got = _of_conv(x, kern, interpret=True)
    ref = _xla_conv(x, kern)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_conv_dx_matches_vjp_oracle(data):
    x, kern, g = data
    _, vjp = jax.vjp(_xla_conv, x, kern)
    dx_ref, dk_ref = vjp(g)
    dx = _conv_dx(g, kern, interpret=True)
    # routed dx runs in bf16 (training numerics): compare loosely
    np.testing.assert_allclose(
        np.asarray(dx, np.float32), dx_ref, rtol=0.05, atol=0.05
    )
    dk = _conv_dk(x, g, jnp.float32)
    np.testing.assert_allclose(dk, dk_ref, rtol=2e-4, atol=2e-4)
    dk16 = _conv_dk(x, g, jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(dk16, np.float32), dk_ref, rtol=0.05,
        atol=0.05 * float(np.abs(dk_ref).max()),
    )


def test_routed_custom_vjp_grads(data, monkeypatch):
    """End-to-end jax.grad through conv3x3x3 with routing forced on
    (interpret-mode Pallas), vs the fp32 XLA vjp."""
    x, kern, _ = data
    monkeypatch.setattr(conv3d, "_route_of", lambda xx, kk, interpret=False: True)
    monkeypatch.setattr(conv3d, "INTERPRET", True)

    def loss(fn):
        def f(xx, kk):
            return jnp.sum(jnp.square(fn(xx, kk)))
        return f

    gx, gk = jax.grad(loss(conv3d.conv3x3x3), argnums=(0, 1))(x, kern)
    rx, rk = jax.grad(loss(_xla_conv), argnums=(0, 1))(x, kern)
    np.testing.assert_allclose(
        np.asarray(gx, np.float32), rx, rtol=0.05,
        atol=0.05 * float(np.abs(rx).max()),
    )
    np.testing.assert_allclose(
        np.asarray(gk, np.float32), rk, rtol=0.05,
        atol=0.05 * float(np.abs(rk).max()),
    )


def test_of_routing_predicate():
    ok = conv3d._of_ok((2, 96, 96, 96, 16), 16)
    assert ok
    assert not conv3d._of_ok((2, 96, 24, 24, 16), 16)  # too small
    assert not conv3d._of_ok((2, 95, 96, 96, 16), 16)  # odd depth
    assert not conv3d._of_ok((2, 96, 96, 96, 128), 16)  # wide channels
    # CPU backend: routing must stay off (exact XLA fallback for tests)
    if jax.default_backend() != "tpu":
        x = jnp.zeros((2, 96, 96, 96, 16))
        k = jnp.zeros((3, 3, 3, 16, 16))
        assert not conv3d._route_of(x, k)


def test_wgrad_kernel_matches_vjp_oracle(data):
    """The Pallas wgrad kernel (adjoint-rolled cotangents @ fwd patches^T)
    vs the fp32 XLA vjp filter grad. fp32 operands here isolate the adjoint
    algebra (edge masks, roll directions, z-halo masking) from bf16 noise;
    the bf16-operand form is covered by test_routed_custom_vjp_grads."""
    from medseg.kernels.conv_of import (
        conv3x3x3_wgrad_of,
        to_output_form,
        wgrad_to_kernel,
    )

    x, kern, g = data
    _, vjp = jax.vjp(_xla_conv, x, kern)
    _, dk_ref = vjp(g)

    b, d, h, w, ci = x.shape
    co = g.shape[-1]
    x_of = to_output_form(x, dtype=jnp.float32)
    g_of = g.transpose(0, 1, 4, 2, 3).reshape(b, d, co, h * w)
    dw = conv3x3x3_wgrad_of(x_of, g_of, h=h, w=w, interpret=True)
    dk = wgrad_to_kernel(dw, ci, co)
    np.testing.assert_allclose(
        np.asarray(dk), np.asarray(dk_ref), rtol=2e-4,
        atol=2e-4 * float(np.abs(dk_ref).max()),
    )


def test_of_wgrad_helper_matches_bf16_oracle(data):
    """The bf16 _of_wgrad (the routed bwd's filter grad) vs _conv_dk(bf16)."""
    x, kern, g = data
    dk_ref = _conv_dk(x, g, jnp.bfloat16)
    dk = conv3d._of_wgrad(x, g, interpret=True)
    np.testing.assert_allclose(
        np.asarray(dk, np.float32), np.asarray(dk_ref, np.float32),
        rtol=0.02, atol=0.02 * float(np.abs(np.asarray(dk_ref)).max()),
    )
