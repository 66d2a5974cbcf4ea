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


class TestOfBlockPath:
    """Block-level of-form training path (models/blocks.py _of_block_route):
    value + grad parity of the of-form UnetResBlock/UnetBasicBlock forward
    against the plain NDHWC path with the SAME parameters."""

    @staticmethod
    def _force_of(monkeypatch, on: bool):
        monkeypatch.setattr(conv3d, "INTERPRET", True)
        monkeypatch.setattr(conv3d, "train_of_active", lambda: on)

    @staticmethod
    def _mk(in_ch, features, res=True):
        from medseg.models.blocks import UnetBasicBlock, UnetResBlock

        blk = (UnetResBlock if res else UnetBasicBlock)(features)
        x = jax.random.normal(jax.random.key(1), (1, 4, 48, 48, in_ch), jnp.float32)
        params = blk.init(jax.random.key(2), x)
        return blk, x, params

    @pytest.mark.parametrize("in_ch,feat,res", [(8, 8, True), (16, 8, True), (8, 8, False)])
    def test_block_value_parity(self, monkeypatch, in_ch, feat, res):
        blk, x, params = self._mk(in_ch, feat, res)
        self._force_of(monkeypatch, False)
        ref = blk.apply(params, x)
        self._force_of(monkeypatch, True)
        got = blk.apply(params, x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4,
            atol=1e-4 * float(np.abs(np.asarray(ref)).max()),
        )

    @pytest.mark.parametrize("in_ch,feat", [(8, 8), (16, 8)])
    def test_block_grad_parity(self, monkeypatch, in_ch, feat):
        blk, x, params = self._mk(in_ch, feat)

        def loss(p, xx):
            return jnp.sum(jnp.square(blk.apply(p, xx)))

        self._force_of(monkeypatch, False)
        gp_ref, gx_ref = jax.grad(loss, argnums=(0, 1))(params, x)
        self._force_of(monkeypatch, True)
        gp, gx = jax.grad(loss, argnums=(0, 1))(params, x)

        np.testing.assert_allclose(
            np.asarray(gx), np.asarray(gx_ref), rtol=5e-3,
            atol=5e-3 * float(np.abs(np.asarray(gx_ref)).max()),
        )
        flat_ref = jax.tree_util.tree_leaves_with_path(gp_ref)
        flat = dict(jax.tree_util.tree_leaves_with_path(gp))
        # conv-bias grads are analytically ~0 (InstanceNorm cancels a bias
        # shift) so both paths produce noise there — floor the atol by the
        # global gradient scale instead of the per-tensor max.
        gscale = max(
            float(np.abs(np.asarray(r, np.float32)).max()) for _, r in flat_ref
        )
        for path, ref in flat_ref:
            got = flat[path]
            np.testing.assert_allclose(
                np.asarray(got, np.float32), np.asarray(ref, np.float32),
                rtol=5e-3, atol=1e-3 * gscale,
                err_msg=str(path),
            )

    def test_grads_are_finite_and_guard_rows_zero(self, monkeypatch):
        """The DPAD guard-row contract: conv outputs have zeroed guard rows
        and the custom vjp returns zero cotangent there (no NaN leaks)."""
        from medseg.kernels.conv_of import DPAD, to_output_form

        monkeypatch.setattr(conv3d, "INTERPRET", True)
        x = jax.random.normal(jax.random.key(3), (1, 4, 48, 48, 8), jnp.float32)
        kern = jax.random.normal(jax.random.key(4), (3, 3, 3, 8, 8), jnp.float32) * 0.2
        x_of = to_output_form(x)
        y = conv3d.conv3x3x3_ofio(x_of, kern, 48, 48)
        assert bool(jnp.all(y[:, :DPAD] == 0)) and bool(jnp.all(y[:, -DPAD:] == 0))

        def f(xx, kk):
            return jnp.sum(jnp.square(conv3d.conv3x3x3_ofio(xx, kk, 48, 48)))

        gx, gk = jax.grad(f, argnums=(0, 1))(x_of, kern)
        assert bool(jnp.all(jnp.isfinite(gx))) and bool(jnp.all(jnp.isfinite(gk)))
        assert bool(jnp.all(gx[:, :DPAD] == 0)) and bool(jnp.all(gx[:, -DPAD:] == 0))
