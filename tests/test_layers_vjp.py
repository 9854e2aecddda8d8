"""Pin the MXU bias-gradient VJP (models/layers.py::linear_bias_act).

The custom VJP exists purely for speed (the bias grad of y = x@W + b as an
MXU dot instead of a slow convert+reduce — measured 175-374 GB/s vs
664-938 GB/s on the v5e); its contract is that the forward is BITWISE the
plain formula and all three gradients are exactly autodiff's math. These
tests pin that contract in both accumulation modes, plus composition with
jax.checkpoint (the pipeline remat path wraps whole blocks).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpreid_tpu.models.layers import linear_bias_act


def _inputs(bl=(4, 9), din=32, dout=48):
    x = jax.random.normal(jax.random.PRNGKey(0), (*bl, din), jnp.bfloat16)
    kernel = jax.random.normal(jax.random.PRNGKey(1), (din, dout), jnp.float32)
    bias = jax.random.normal(jax.random.PRNGKey(2), (dout,), jnp.float32)
    return x, kernel, bias


def _ref(x, kernel, bias, accum_f32):
    kb = kernel.astype(jnp.bfloat16)
    if accum_f32:
        # attention-projection convention: fp32 MXU accumulation + fp32 bias
        y = jnp.dot(x, kb, preferred_element_type=jnp.float32) + bias
        return y.astype(jnp.bfloat16)
    # flax-Dense convention: everything in the activation dtype
    return jnp.dot(x, kb) + bias.astype(jnp.bfloat16)


@pytest.mark.parametrize("accum_f32", [True, False])
def test_forward_bitwise(accum_f32):
    x, kernel, bias = _inputs()
    got = linear_bias_act(x, kernel.astype(jnp.bfloat16), bias, jnp.bfloat16,
                          accum_f32=accum_f32)
    want = _ref(x, kernel, bias, accum_f32)
    assert got.dtype == want.dtype
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


@pytest.mark.parametrize("accum_f32", [True, False])
@pytest.mark.parametrize("bl", [(6,), (4, 9), (2, 3, 5)])
def test_grads_match_autodiff_exactly(accum_f32, bl):
    """dx/dW must equal plain-autodiff-of-the-formula bit for bit; db is
    the fp32-MXU-accumulated sum of the cotangent (in the accum_f32=False
    mode that is a deliberate precision UPGRADE over autodiff's bf16
    reduce — pinned exactly against an explicit fp32 oracle)."""
    x, kernel, bias = _inputs(bl=bl)

    def f(x, k, b):
        y = linear_bias_act(x, k.astype(jnp.bfloat16), b, jnp.bfloat16,
                            accum_f32=accum_f32)
        return (y.astype(jnp.float32) * jnp.cos(y.astype(jnp.float32))).sum()

    def g(x, k, b):
        y = _ref(x, k, b, accum_f32)
        return (y.astype(jnp.float32) * jnp.cos(y.astype(jnp.float32))).sum()

    got = jax.grad(f, argnums=(0, 1, 2))(x, kernel, bias)
    want = jax.grad(g, argnums=(0, 1, 2))(x, kernel, bias)
    for name, a, b in zip(("dx", "dW"), got[:2], want[:2]):
        assert a.dtype == b.dtype, name
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32), err_msg=name)
    # db oracle: the exact cotangent (recoverable as d/db of g with b held
    # fp32 through the add), summed over batch dims in fp32
    dy = jax.grad(
        lambda y: (y.astype(jnp.float32) * jnp.cos(y.astype(jnp.float32))).sum()
    )(_ref(x, kernel, bias, accum_f32))
    want_db = np.asarray(dy, np.float32).reshape(-1, bias.shape[0]).sum(0)
    assert got[2].dtype == bias.dtype
    np.testing.assert_allclose(np.asarray(got[2], np.float32), want_db,
                               rtol=1e-6, atol=1e-5, err_msg="db")


def test_grad_dtypes_follow_params():
    """db lands in the bias param dtype (fp32 master params), dW in the
    kernel's passed-in dtype, dx in the activation dtype."""
    x, kernel, bias = _inputs()

    def f(x, k, b):
        return linear_bias_act(x, k, b, jnp.bfloat16).astype(jnp.float32).sum()

    dx, dw, db = jax.grad(f, argnums=(0, 1, 2))(
        x, kernel.astype(jnp.bfloat16), bias)
    assert dx.dtype == jnp.bfloat16
    assert dw.dtype == jnp.bfloat16
    assert db.dtype == jnp.float32


def test_under_checkpoint_and_jit():
    """Remat (pipeline stages wrap blocks in jax.checkpoint) must compose."""
    x, kernel, bias = _inputs()

    @jax.jit
    def f(x, k, b):
        def inner(x):
            return linear_bias_act(x, k.astype(jnp.bfloat16), b,
                                   jnp.bfloat16).astype(jnp.float32).sum()
        return jax.checkpoint(inner)(x)

    def g(x, k, b):
        return _ref(x, k, b, True).astype(jnp.float32).sum()

    got = jax.grad(f)(x, kernel, bias)
    want = jax.grad(g)(x, kernel, bias)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))
