"""Fused Pallas Adam/AdamW update (ops/adam_kernel.py) — must reproduce
the solver's XLA tree_map path exactly (the kernel is an HBM-bandwidth
optimization, not a numerics change)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mpreid_tpu.ops.adam_kernel import fused_adam_leaf


def _xla_adam(p, m0, v0, g, lr, mult, b1, b2, eps, wd, decoupled, t, md):
    """The solver's per-leaf Adam math (solver/optim.py update)."""
    if not decoupled:
        g = g + wd * p
    m32 = b1 * m0.astype(jnp.float32) + (1 - b1) * g
    v32 = b2 * v0.astype(jnp.float32) + (1 - b2) * jnp.square(g)
    bc1 = 1 - b1 ** t
    bc2 = 1 - b2 ** t
    step = lr * mult * (m32 / bc1) / (jnp.sqrt(v32 / bc2) + eps)
    if decoupled:
        step = step + lr * mult * wd * p
    return p - step, m32.astype(md), v32.astype(md)


@pytest.mark.parametrize("decoupled", [False, True])
@pytest.mark.parametrize("md", [jnp.float32, jnp.bfloat16])
def test_fused_adam_leaf_matches_xla(decoupled, md):
    rng = np.random.RandomState(0)
    shape = (257, 130)  # deliberately unaligned: exercises flatten+pad
    p = jnp.asarray(rng.randn(*shape).astype(np.float32))
    g = jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.1)
    m0 = jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.01).astype(md)
    v0 = jnp.abs(jnp.asarray(rng.randn(*shape).astype(np.float32) * 1e-4)
                 ).astype(md)
    b1, b2, eps, wd, lr, mult, t = 0.9, 0.999, 1e-8, 1e-4, 3e-4, 2.0, 5.0

    exp_p, exp_m, exp_v = _xla_adam(
        p, m0, v0, g, lr, mult, b1, b2, eps, wd, decoupled, t, md
    )
    scalars = jnp.asarray([lr * mult, 1 - b1 ** t, 1 - b2 ** t], jnp.float32)
    got_p, got_m, got_v = fused_adam_leaf(
        p, m0, v0, g, scalars, b1, b2, eps, wd, decoupled, md,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(exp_p),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(got_m, np.float32), np.asarray(exp_m, np.float32),
        rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(got_v, np.float32), np.asarray(exp_v, np.float32),
        rtol=1e-6, atol=1e-10)


def test_fused_adam_zero_wd():
    rng = np.random.RandomState(1)
    shape = (1024,)
    p = jnp.asarray(rng.randn(*shape).astype(np.float32))
    g = jnp.asarray(rng.randn(*shape).astype(np.float32))
    z = jnp.zeros(shape, jnp.float32)
    scalars = jnp.asarray([1e-3, 0.1, 0.001], jnp.float32)
    got_p, got_m, got_v = fused_adam_leaf(
        p, z, z, g, scalars, 0.9, 0.999, 1e-8, 0.0, False, jnp.float32,
        interpret=True,
    )
    # bc1=0.1 / bc2=0.001 in `scalars` correspond exactly to t=1
    exp_p, exp_m, exp_v = _xla_adam(
        p, z, z, g, 1e-3, 1.0, 0.9, 0.999, 1e-8, 0.0, False,
        t=1.0, md=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(exp_p),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(exp_m),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(exp_v),
                               rtol=1e-6, atol=1e-10)


def test_optimizer_fused_flag_off_on_cpu():
    """On CPU (the test host) _fused_active() must be False — the solver
    always takes the XLA path here, and multi-device programs everywhere.
    The config default is ALSO off (measured slower than XLA's loop fusion
    on the v5e, see defaults.py FUSED_ADAM); opting in must still not
    activate off-TPU."""
    from mpreid_tpu.solver.optim import make_optimizer
    from tiny import tiny_cfg, tiny_model

    cfg = tiny_cfg()
    model, variables = tiny_model(cfg, num_classes=4)
    opt = make_optimizer(cfg.SOLVER, variables["params"], stage="baseline")
    assert not opt.fused_adam  # measured dead end: default off
    cfg.SOLVER.FUSED_ADAM = True
    opt2 = make_optimizer(cfg.SOLVER, variables["params"], stage="baseline")
    assert opt2.fused_adam
    assert not opt2._fused_active()  # opt-in still inactive off-TPU
