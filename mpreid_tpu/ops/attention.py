"""Pallas fused multi-head attention (TPU hot path).

Motivation (profiled on the v5e, stage-2 train step, batch 64 ViT-B/16):
XLA lowers the einsum attention to batched matmuls over a (B, H, L, dh)
layout, materializing head transposes and fp32 score tensors in HBM —
"data formatting" + copies cost ~8 ms of a 49 ms step while the attention
math itself is worth <0.5 ms at these shapes (L = 129 vision tokens / 77
text tokens). This kernel keeps the whole attention core — per-head score
matmul, softmax, value matmul — in VMEM per batch element: HBM sees exactly
one read of the packed QKV block and one write of the output block.

Layout contract: input is the packed QKV activation ``(B, L, 3·D)`` straight
out of the in_proj matmul (torch ``nn.MultiheadAttention`` packing: [q|k|v],
ref ``model/clip/model.py:264``), output is ``(B, L, D)`` ready for the
out_proj matmul. No head transposes ever touch HBM.

Numerics mirror ``models/layers.py::MultiHeadAttention`` exactly: q is
scaled in the activation dtype, scores/softmax accumulate fp32, probs are
cast back to the activation dtype for the value matmul (fp32 MXU
accumulation). The custom VJP recomputes scores/probs per head in VMEM
(flash-style — nothing but qkv and the output cotangent is read from HBM).

Off-TPU this falls back to the pure-XLA einsum path (also the autodiff
oracle for the kernel tests, which run the kernels via ``interpret=True``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import _on_tpu


# ---------------------------------------------------------------------------
# XLA reference path (CPU fallback + autodiff oracle)
# ---------------------------------------------------------------------------

def mha_reference(qkv: jax.Array, num_heads: int,
                  mask: Optional[jax.Array] = None) -> jax.Array:
    """Einsum attention on packed QKV — the pre-kernel layers.py math."""
    b, l, dd = qkv.shape
    d = dd // 3
    head_dim = d // num_heads
    dtype = qkv.dtype
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(b, l, num_heads, head_dim).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    scale = jnp.asarray(head_dim ** -0.5, dtype)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    if mask is not None:
        logits = logits + mask.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32)
    return out.astype(dtype).transpose(0, 2, 1, 3).reshape(b, l, d)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

# Batch-tile sizes: each grid step processes BT batch elements so the
# per-head matmuls become head-batched dot_generals over a (BT, L, ·) tile —
# one Mosaic op per head instead of one per (batch element, head). With
# per-element grids the kernels are op-overhead-bound (64 steps × 12 heads ×
# ~6 small ops); tiling cuts the op count 8× and lets the MXU pipeline.
# VMEM @ BT=8, ViT-B/16 (L=129): qkv 4.8 MB + out 1.6 MB + (BT, L, L) fp32
# temporaries ~0.5 MB each. The backward touches qkv + do + dqkv (11 MB at
# BT=8, ~19 MB double-buffered) — beyond Mosaic's default 16 MB scoped limit
# but well within the chip's physical VMEM, so the backward raises
# vmem_limit_bytes instead of shrinking the tile (v5e: BT=8@32MB beats BT=4
# by ~17% in-step). A probs-saving VJP variant (fwd emits softmax probs,
# bwd skips the recompute) was measured SLOWER in the full step — the extra
# 2x25 MB of HBM probs traffic outweighs the op savings — so the backward
# recomputes probs in VMEM, flash-style.
_BT_FWD = 8
_BT_BWD = 8
_BWD_VMEM_LIMIT = 32 << 20


def _batched_dot(a, b, contract, batch=((0,), (0,))):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(contract, batch),
        preferred_element_type=jnp.float32,
    )


def _probs_for_head(qkv, mask, h, head_dim, d, dtype):
    """(BT, L, L) fp32 softmax probabilities for head ``h`` (shared fwd/bwd)."""
    lo = h * head_dim
    q = qkv[:, :, lo:lo + head_dim]
    k = qkv[:, :, d + lo:d + lo + head_dim]
    scale = jnp.asarray(head_dim ** -0.5, dtype)
    s = _batched_dot(q * scale, k, contract=((2,), (2,)))
    if mask is not None:
        s = s + mask
    return jax.nn.softmax(s, axis=-1)


def _mha_fwd_kernel(num_heads: int, use_mask: bool, *refs):
    if use_mask:
        qkv_ref, mask_ref, out_ref = refs
        mask = mask_ref[:].astype(jnp.float32)
    else:
        qkv_ref, out_ref = refs
        mask = None
    qkv = qkv_ref[:]
    d = qkv.shape[-1] // 3
    head_dim = d // num_heads
    dtype = qkv.dtype
    for h in range(num_heads):
        lo = h * head_dim
        p = _probs_for_head(qkv, mask, h, head_dim, d, dtype)
        v = qkv[:, :, 2 * d + lo:2 * d + lo + head_dim]
        o = _batched_dot(p.astype(dtype), v, contract=((2,), (1,)))
        out_ref[:, :, lo:lo + head_dim] = o.astype(dtype)


def _mha_bwd_kernel(num_heads: int, use_mask: bool, *refs):
    if use_mask:
        qkv_ref, mask_ref, do_ref, dqkv_ref = refs
        mask = mask_ref[:].astype(jnp.float32)
    else:
        qkv_ref, do_ref, dqkv_ref = refs
        mask = None
    qkv = qkv_ref[:]
    d = qkv.shape[-1] // 3
    head_dim = d // num_heads
    dtype = qkv.dtype
    scale = head_dim ** -0.5
    for h in range(num_heads):
        lo = h * head_dim
        q = qkv[:, :, lo:lo + head_dim]
        k = qkv[:, :, d + lo:d + lo + head_dim]
        v = qkv[:, :, 2 * d + lo:2 * d + lo + head_dim]
        p = _probs_for_head(qkv, mask, h, head_dim, d, dtype)  # (BT, Lq, Lk) f32
        do = do_ref[:, :, lo:lo + head_dim]                    # (BT, Lq, dh)

        pc = p.astype(dtype)
        dv = _batched_dot(pc, do, contract=((1,), (1,)))       # (BT, Lk, dh)
        dp = _batched_dot(do, v, contract=((2,), (2,)))        # (BT, Lq, Lk)
        # softmax VJP: ds = p ⊙ (dp − rowsum(dp ⊙ p))
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsc = ds.astype(dtype)
        dq = _batched_dot(dsc, k, contract=((2,), (1,))) * scale
        dk = _batched_dot(dsc, q, contract=((1,), (1,))) * scale
        dqkv_ref[:, :, lo:lo + head_dim] = dq.astype(dtype)
        dqkv_ref[:, :, d + lo:d + lo + head_dim] = dk.astype(dtype)
        dqkv_ref[:, :, 2 * d + lo:2 * d + lo + head_dim] = dv.astype(dtype)


def _pad_batch(x, bt):
    b = x.shape[0]
    rem = b % bt
    if rem == 0:
        return x, b
    return jnp.pad(x, ((0, bt - rem),) + ((0, 0),) * (x.ndim - 1)), b


def _block_specs(bt, l, dd, use_mask):
    in_specs = [
        pl.BlockSpec((bt, l, dd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    ]
    if use_mask:
        in_specs.append(
            pl.BlockSpec((l, l), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    return in_specs


def _mha_fwd_pallas(qkv, mask, num_heads, interpret):
    l, dd = qkv.shape[1:]
    d = dd // 3
    use_mask = mask is not None
    bt = min(_BT_FWD, qkv.shape[0])
    qkv_p, b = _pad_batch(qkv, bt)
    kernel = functools.partial(_mha_fwd_kernel, num_heads, use_mask)
    in_specs = _block_specs(bt, l, dd, use_mask)
    args = (qkv_p, mask.astype(jnp.float32)) if use_mask else (qkv_p,)
    out = pl.pallas_call(
        kernel,
        grid=(qkv_p.shape[0] // bt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bt, l, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qkv_p.shape[0], l, d), qkv.dtype),
        interpret=interpret,
    )(*args)
    return out[:b]


def _mha_bwd_pallas(qkv, mask, do, num_heads, interpret):
    l, dd = qkv.shape[1:]
    d = dd // 3
    use_mask = mask is not None
    bt = min(_BT_BWD, qkv.shape[0])
    qkv_p, b = _pad_batch(qkv, bt)
    do_p, _ = _pad_batch(do, bt)
    kernel = functools.partial(_mha_bwd_kernel, num_heads, use_mask)
    in_specs = _block_specs(bt, l, dd, use_mask)
    in_specs.append(
        pl.BlockSpec((bt, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    )
    args = ((qkv_p, mask.astype(jnp.float32), do_p) if use_mask
            else (qkv_p, do_p))
    dqkv = pl.pallas_call(
        kernel,
        grid=(qkv_p.shape[0] // bt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bt, l, dd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qkv_p.shape[0], l, dd), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_BWD_VMEM_LIMIT
        ),
        interpret=interpret,
    )(*args)
    return dqkv[:b]


# ---------------------------------------------------------------------------
# custom-VJP wrapper + public entry
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fused_mha(qkv, mask, num_heads: int, interpret: bool):
    return _mha_fwd_pallas(qkv, mask, num_heads, interpret)


def _fused_mha_fwd(qkv, mask, num_heads, interpret):
    return _mha_fwd_pallas(qkv, mask, num_heads, interpret), (qkv, mask)


def _fused_mha_bwd(num_heads, interpret, residuals, do):
    qkv, mask = residuals
    dqkv = _mha_bwd_pallas(qkv, mask, do, num_heads, interpret)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dqkv, dmask


_fused_mha.defvjp(_fused_mha_fwd, _fused_mha_bwd)


def fused_attention(
    qkv: jax.Array,
    num_heads: int,
    mask: Optional[jax.Array] = None,
    force: Optional[str] = None,
) -> jax.Array:
    """Multi-head attention on packed (B, L, 3D) QKV → (B, L, D).

    ``force``: None (auto: Pallas on TPU, XLA elsewhere), 'pallas',
    'interpret' (Pallas kernels in interpreter mode — CPU tests) or 'xla'.

    ``mask`` is non-differentiable by contract (it is the constant causal
    mask in every in-repo use); it is stop_gradient'ed on BOTH paths so the
    Pallas VJP's zero mask-cotangent and the XLA path's autodiff agree. A
    learned attention bias must be added to the logits by the caller, not
    passed as ``mask``.
    """
    if mask is not None:
        mask = jax.lax.stop_gradient(mask)
    if force is None:
        force = "pallas" if _on_tpu() else "xla"
    if force == "xla":
        return mha_reference(qkv, num_heads, mask)
    return _fused_mha(qkv, mask, num_heads, force == "interpret")
