"""Fused Adam/AdamW parameter+moment update (Pallas, HBM-bound).

The stage-2 roofline (tools/profile_stage2.py, round 3) shows the Adam
update HBM-bound at ~513 GB/s vs the v5e's ~800 GB/s peak — ~4.7 ms for
87M trainable params (2.4 GB of p/m/v/g traffic). XLA emits one loop
fusion per leaf but schedules them conservatively; this kernel streams
each large leaf through VMEM in one pass with explicit double-buffered
blocks and in-place aliasing (p/m/v are donated — no fresh allocations).

Math is IDENTICAL to ``solver.optim.Optimizer.update``'s Adam branch:
coupled L2 (Adam) folds wd·p into the gradient, decoupled (AdamW) adds
lr·mult·wd·p to the step; moments update in fp32 and are stored in
``moment_dtype``; the step uses the fresh fp32 moments. Equivalence is
pinned by ``tests/test_adam_kernel.py`` (interpret mode vs the tree_map
path).

Only engaged for single-device programs: like every Pallas custom call,
GSPMD cannot partition it, so sharded leaves (ZeRO-1 / TP) always take
the XLA path (see solver/optim.py wiring).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import _on_tpu  # noqa: F401  (re-exported for solver)

_LANES = 1024          # flattened minor dim (multiple of 128)
_ROWS = 128            # rows per grid step → ~3.7 MB in + ~2.8 MB out blocks
# leaves below this many elements stay on the XLA path — kernel-launch
# overhead beats the bandwidth win for small tensors
MIN_FUSED_SIZE = 262144


def _adam_kernel(b1, b2, eps, wd, decoupled, md, *refs):
    s_ref, p_ref, m_ref, v_ref, g_ref, po_ref, mo_ref, vo_ref = refs
    lr_eff = s_ref[0]      # lr · per-leaf multiplier
    bc1 = s_ref[1]         # 1 − b1^t
    bc2 = s_ref[2]         # 1 − b2^t

    p = p_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    if wd and not decoupled:
        g = g + wd * p     # coupled L2 (torch Adam)
    m = b1 * m_ref[:].astype(jnp.float32) + (1 - b1) * g
    v = b2 * v_ref[:].astype(jnp.float32) + (1 - b2) * g * g
    step = lr_eff * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
    if wd and decoupled:
        step = step + lr_eff * wd * p   # decoupled (torch AdamW)
    po_ref[:] = (p - step).astype(po_ref.dtype)
    mo_ref[:] = m.astype(md)
    vo_ref[:] = v.astype(md)


def fused_adam_leaf(
    p: jax.Array,
    m: jax.Array,
    v: jax.Array,
    g: jax.Array,
    scalars: jax.Array,        # (3,) f32: [lr·mult, 1−b1^t, 1−b2^t]
    b1: float,
    b2: float,
    eps: float,
    wd: float,
    decoupled: bool,
    moment_dtype=jnp.float32,
    interpret: bool = False,
):
    """One leaf's fused update → (p', m', v'). p/m/v alias their outputs."""
    shape, pdt = p.shape, p.dtype
    n = p.size
    pad = (-n) % (_ROWS * _LANES)

    def prep(x):
        x = x.reshape(-1)
        if pad:
            x = jnp.pad(x, (0, pad))
        return x.reshape(-1, _LANES)

    pp, mp, vp, gp = prep(p), prep(m), prep(v), prep(g)
    rows = pp.shape[0]
    kernel = functools.partial(
        _adam_kernel, b1, b2, eps, wd, decoupled, moment_dtype
    )
    blk = lambda dt: pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    po, mo, vo = pl.pallas_call(
        kernel,
        grid=(rows // _ROWS,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            blk(pdt), blk(mp.dtype), blk(vp.dtype), blk(gp.dtype),
        ],
        out_specs=(blk(pdt), blk(moment_dtype), blk(moment_dtype)),
        out_shape=(
            jax.ShapeDtypeStruct(pp.shape, pdt),
            jax.ShapeDtypeStruct(mp.shape, moment_dtype),
            jax.ShapeDtypeStruct(vp.shape, moment_dtype),
        ),
        input_output_aliases=(
            {1: 0, 2: 1, 3: 2}
            if mp.dtype == moment_dtype else {1: 0}
        ),
        interpret=interpret,
    )(scalars, pp, mp, vp, gp)

    def unprep(x, dt):
        return x.reshape(-1)[:n].reshape(shape).astype(dt)

    return unprep(po, pdt), unprep(mo, moment_dtype), unprep(vo, moment_dtype)
