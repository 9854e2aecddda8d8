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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import _on_tpu


# ---------------------------------------------------------------------------
# TP-towers interlock
#
# Under TPU.TP_TOWERS the tower in_proj/out_proj weights are Megatron-sharded
# over the 'model' mesh axis (parallel/mesh.py::param_spec), so the QKV
# activation arrives sharded along its head axis. GSPMD can split the XLA
# einsum attention over heads, but it CANNOT partition the Pallas custom
# call — on real multi-chip hardware the fused kernel would force an
# all-gather of the sharded activation (or fail to lower). The selection
# below therefore consults a process-wide flag that
# ``parallel.mesh.shard_variables(..., tp_towers=True)`` — the single choke
# point where tower params become 'model'-sharded — flips on: with TP-towers
# active the auto selection is the partitionable XLA path everywhere,
# INCLUDING on TPU, so CPU-mesh tests and ``dryrun_multichip`` exercise the
# exact code path a real multi-chip TP run takes.
# ---------------------------------------------------------------------------

_TP_SHARDED_TOWERS = False


def set_tp_sharded_towers(active: bool) -> None:
    """Record that tower params are (or are no longer) 'model'-sharded.

    Called by ``parallel.mesh.shard_variables`` with ``tp_towers=True``;
    tests may call it directly to reset. Must be set BEFORE the step is
    traced — the selection is a trace-time decision.
    """
    global _TP_SHARDED_TOWERS
    _TP_SHARDED_TOWERS = bool(active)


def tp_sharded_towers() -> bool:
    return _TP_SHARDED_TOWERS


def _auto_impl() -> str:
    """Trace-time impl selection for ``force=None``.

    Pallas on TPU (in-model win, see fused_attention_hm note) — unless the
    towers are tensor-parallel, in which case the head axis is 'model'-
    sharded and only the XLA einsum path is GSPMD-partitionable.
    """
    if _TP_SHARDED_TOWERS:
        return "xla"
    return "pallas" if _on_tpu() else "xla"


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


# ---------------------------------------------------------------------------
# head-major layout variant
#
# The packed-QKV kernels above load the full (BT, L, 3D) block per grid step
# and python-loop over heads — the backward needs a raised 32 MB VMEM limit
# and is op-overhead-bound (~4 ms/step vs ~0.3 ideal, round-2 profile). The
# head-major variant instead permutes the in_proj WEIGHT columns statically
# (head_major_perm) so the projection emits (B, L, H×[q_h|k_h|v_h]): every
# head's q/k/v is a contiguous column slice, the pallas grid tiles
# (batch-tile × head), and each grid step touches only (BT, L, 3·dh) — small
# enough for deep double-buffering under the DEFAULT VMEM limit.
# ---------------------------------------------------------------------------

# Tile knobs, split per direction so fwd/bwd tune independently (the bwd
# holds ~3x the fwd's VMEM working set per tile). Defaults are the round-3
# measured optimum (BT=32, HG=2); tools/bench_attn_tiles.py sweeps these
# in-model.
_BT_HM_FWD = 32             # batch elements per fwd grid step
_BT_HM_BWD = 32             # batch elements per bwd grid step
_HG_HM_FWD = 2              # heads per fwd grid step (lower bound; _pick_hg)
_HG_HM_BWD = 2              # heads per bwd grid step (lower bound; _pick_hg)
# Mosaic scoped-VMEM limits, split per direction so a tile sweep relaxing
# one kernel's budget cannot change the other's scheduling/buffering (the
# r4 sweep confound: one shared limit made fwd-tile rows non-isolated A/Bs).
_VMEM_HM_FWD = 32 << 20
_VMEM_HM_BWD = 32 << 20

# Default layouts the model layers emit (models/layers.py):
#   "packed"    — params in torch [q|k|v] packing, whole-row kernel.
#   "hm"        — params stay packed, in_proj columns permuted IN-GRAPH each
#                 step, (batch × head-group)-tiled kernels.
#   "hm_native" — params are STORED head-major (converters permute at
#                 import/export, models/clip_model.py), no in-graph permute,
#                 same tiled kernels. Removes the permute's gather (fwd) and
#                 scatter (bwd) entirely — the right choice for towers whose
#                 in_proj weights TRAIN (the in-graph "hm" permute on trained
#                 weights measured ~2% slower than packed: stage-2a 1625
#                 packed vs 1594 hm, tools/bench_stages_ab.py).
# Same math bitwise in all three. MODEL_LAYOUT is the vision-tower default,
# TEXT_LAYOUT the text-tower default. "hm_native" measured fastest for BOTH
# on the v5e (tools/bench_stages_ab.py, round 3): stage-2a vision 1661
# (native) vs 1621 (packed) vs 1578 (hm) img/s; stage-1a text 7902 (native)
# vs 7714 (hm) img/s. Overridable per model via MODEL.ATTN_LAYOUT_{VISION,TEXT}.
MODEL_LAYOUT = "hm_native"
TEXT_LAYOUT = "hm_native"


VALID_LAYOUTS = ("packed", "hm", "hm_native")


def resolve_layout(layout: Optional[str], tower: str = "vision") -> str:
    """Map a config/module layout value ('' or None → tuned default).

    Unknown strings raise — a typo'd MODEL.ATTN_LAYOUT_* must not silently
    select the packed fallback (layers.py dispatches on exact names)."""
    if not layout:
        layout = TEXT_LAYOUT if tower == "text" else MODEL_LAYOUT
    if layout not in VALID_LAYOUTS:
        raise ValueError(
            f"unknown attention layout {layout!r} (tower={tower}); "
            f"expected one of {VALID_LAYOUTS}"
        )
    return layout


def _pick_hg(dh: int, num_heads: int, requested: int) -> int:
    """Heads per grid step honoring the Mosaic block constraint: the block's
    last dim (3·dh·hg for inputs, dh·hg for outputs) must be a multiple of
    128 — or the group must span all heads (block == full array width)."""
    import math

    hg_min = 128 // math.gcd(dh, 128)
    hg = max(requested, hg_min)
    while hg < num_heads:
        if num_heads % hg == 0 and (dh * hg) % 128 == 0:
            return hg
        hg += 1
    return num_heads


@functools.lru_cache(maxsize=None)
def head_major_perm(d: int, num_heads: int) -> np.ndarray:
    """Column permutation: torch packing [q|k|v] → per-head [q_h|k_h|v_h]."""
    dh = d // num_heads
    idx = []
    for h in range(num_heads):
        for part in range(3):
            start = part * d + h * dh
            idx.extend(range(start, start + dh))
    return np.asarray(idx, np.int32)


@functools.lru_cache(maxsize=None)
def head_major_perm_inverse(d: int, num_heads: int) -> np.ndarray:
    """Inverse column permutation: per-head [q_h|k_h|v_h] → torch [q|k|v].

    ``x[head_major_perm(...)][head_major_perm_inverse(...)] == x`` — used by
    the converters to export natively head-major ("hm_native") parameters
    back to the reference's packed state_dict layout."""
    return np.argsort(head_major_perm(d, num_heads)).astype(np.int32)


def mha_reference_hm(qkv: jax.Array, num_heads: int,
                     mask: Optional[jax.Array] = None) -> jax.Array:
    """Einsum attention on HEAD-MAJOR packed QKV (autodiff oracle)."""
    b, l, dd = qkv.shape
    dh = dd // (3 * num_heads)
    dtype = qkv.dtype
    t = qkv.reshape(b, l, num_heads, 3 * dh)
    q, k, v = t[..., :dh], t[..., dh:2 * dh], t[..., 2 * dh:]
    scale = jnp.asarray(dh ** -0.5, dtype)
    logits = jnp.einsum(
        "blhd,bmhd->bhlm", q * scale, k, preferred_element_type=jnp.float32
    )
    if mask is not None:
        logits = logits + mask.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    out = jnp.einsum("bhlm,bmhd->blhd", probs, v,
                     preferred_element_type=jnp.float32)
    return out.astype(dtype).reshape(b, l, num_heads * dh)


def _hm_head_math(qkv_h, mask, dh, dtype):
    """probs + v for one head's (BT, L, 3dh) slice."""
    q = qkv_h[:, :, :dh]
    k = qkv_h[:, :, dh:2 * dh]
    v = qkv_h[:, :, 2 * dh:]
    scale = jnp.asarray(dh ** -0.5, dtype)
    s = _batched_dot(q * scale, k, contract=((2,), (2,)))
    if mask is not None:
        s = s + mask
    return jax.nn.softmax(s, axis=-1), q, k, v


def _mha_fwd_kernel_hm(heads_per_step: int, dh: int, use_mask: bool, *refs):
    if use_mask:
        qkv_ref, mask_ref, out_ref = refs
        mask = mask_ref[:].astype(jnp.float32)
    else:
        qkv_ref, out_ref = refs
        mask = None
    dtype = qkv_ref.dtype
    for g in range(heads_per_step):
        qkv_h = qkv_ref[:, :, g * 3 * dh:(g + 1) * 3 * dh]
        p, _, _, v = _hm_head_math(qkv_h, mask, dh, dtype)
        o = _batched_dot(p.astype(dtype), v, contract=((2,), (1,)))
        out_ref[:, :, g * dh:(g + 1) * dh] = o.astype(dtype)


def _mha_bwd_kernel_hm(heads_per_step: int, dh: int, use_mask: bool, *refs):
    if use_mask:
        qkv_ref, mask_ref, do_ref, dqkv_ref = refs
        mask = mask_ref[:].astype(jnp.float32)
    else:
        qkv_ref, do_ref, dqkv_ref = refs
        mask = None
    dtype = qkv_ref.dtype
    scale = dh ** -0.5
    for g in range(heads_per_step):
        qkv_h = qkv_ref[:, :, g * 3 * dh:(g + 1) * 3 * dh]
        p, q, k, v = _hm_head_math(qkv_h, mask, dh, dtype)
        do = do_ref[:, :, g * dh:(g + 1) * dh]
        pc = p.astype(dtype)
        dv = _batched_dot(pc, do, contract=((1,), (1,)))
        dp = _batched_dot(do, v, contract=((2,), (2,)))
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsc = ds.astype(dtype)
        dq = _batched_dot(dsc, k, contract=((2,), (1,))) * scale
        dk = _batched_dot(dsc, q, contract=((1,), (1,))) * scale
        dqkv_ref[:, :, g * 3 * dh:g * 3 * dh + dh] = dq.astype(dtype)
        dqkv_ref[:, :, g * 3 * dh + dh:g * 3 * dh + 2 * dh] = dk.astype(dtype)
        dqkv_ref[:, :, g * 3 * dh + 2 * dh:(g + 1) * 3 * dh] = dv.astype(dtype)


def _hm_specs(bt, l, dh, hg, use_mask):
    in_specs = [
        pl.BlockSpec((bt, l, 3 * dh * hg), lambda i, h: (i, 0, h),
                     memory_space=pltpu.VMEM)
    ]
    if use_mask:
        in_specs.append(
            pl.BlockSpec((l, l), lambda i, h: (0, 0), memory_space=pltpu.VMEM)
        )
    return in_specs


def _mha_fwd_pallas_hm(qkv, mask, num_heads, interpret):
    l, dd = qkv.shape[1:]
    dh = dd // (3 * num_heads)
    use_mask = mask is not None
    bt = min(_BT_HM_FWD, qkv.shape[0])
    hg = _pick_hg(dh, num_heads, _HG_HM_FWD)
    qkv_p, b = _pad_batch(qkv, bt)
    kernel = functools.partial(_mha_fwd_kernel_hm, hg, dh, use_mask)
    args = (qkv_p, mask.astype(jnp.float32)) if use_mask else (qkv_p,)
    out = pl.pallas_call(
        kernel,
        grid=(qkv_p.shape[0] // bt, num_heads // hg),
        in_specs=_hm_specs(bt, l, dh, hg, use_mask),
        out_specs=pl.BlockSpec((bt, l, dh * hg), lambda i, h: (i, 0, h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (qkv_p.shape[0], l, num_heads * dh), qkv.dtype
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_HM_FWD
        ),
        interpret=interpret,
    )(*args)
    return out[:b]


def _mha_bwd_pallas_hm(qkv, mask, do, num_heads, interpret):
    l, dd = qkv.shape[1:]
    dh = dd // (3 * num_heads)
    use_mask = mask is not None
    bt = min(_BT_HM_BWD, qkv.shape[0])
    hg = _pick_hg(dh, num_heads, _HG_HM_BWD)
    qkv_p, b = _pad_batch(qkv, bt)
    do_p, _ = _pad_batch(do, bt)
    kernel = functools.partial(_mha_bwd_kernel_hm, hg, dh, use_mask)
    in_specs = _hm_specs(bt, l, dh, hg, use_mask)
    in_specs.append(
        pl.BlockSpec((bt, l, dh * hg), lambda i, h: (i, 0, h),
                     memory_space=pltpu.VMEM)
    )
    args = ((qkv_p, mask.astype(jnp.float32), do_p) if use_mask
            else (qkv_p, do_p))
    dqkv = pl.pallas_call(
        kernel,
        grid=(qkv_p.shape[0] // bt, num_heads // hg),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bt, l, 3 * dh * hg), lambda i, h: (i, 0, h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qkv_p.shape[0], l, dd), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_HM_BWD
        ),
        interpret=interpret,
    )(*args)
    return dqkv[:b]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fused_mha_hm(qkv, mask, num_heads: int, interpret: bool):
    return _mha_fwd_pallas_hm(qkv, mask, num_heads, interpret)


def _fused_mha_hm_fwd(qkv, mask, num_heads, interpret):
    return _mha_fwd_pallas_hm(qkv, mask, num_heads, interpret), (qkv, mask)


def _fused_mha_hm_bwd(num_heads, interpret, residuals, do):
    qkv, mask = residuals
    dqkv = _mha_bwd_pallas_hm(qkv, mask, do, num_heads, interpret)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dqkv, dmask


_fused_mha_hm.defvjp(_fused_mha_hm_fwd, _fused_mha_hm_bwd)


def fused_attention_hm(
    qkv: jax.Array,
    num_heads: int,
    mask: Optional[jax.Array] = None,
    force: Optional[str] = None,
) -> jax.Array:
    """Multi-head attention on HEAD-MAJOR packed (B, L, 3D) QKV → (B, L, D).

    The caller must emit qkv with ``head_major_perm``-permuted projection
    columns (models/layers.py permutes the in_proj weight statically).
    ``force`` semantics match :func:`fused_attention`.
    """
    if mask is not None:
        mask = jax.lax.stop_gradient(mask)
    if force is None:
        # NOTE: isolated 500-iter kernel chains (tools/bench_attention.py)
        # show XLA beating the Pallas kernel on the masked text shapes —
        # but IN-MODEL (tools/bench_stages_ab.py, stage-1a epoch) the
        # Pallas path wins by ~8%: the einsum path's head transposes and
        # fp32 score copies reappear once XLA schedules them against the
        # rest of the step. Pallas everywhere on TPU — except under
        # TP-towers, where only the XLA path is GSPMD-partitionable
        # (see _auto_impl).
        force = _auto_impl()
    if force == "xla":
        return mha_reference_hm(qkv, num_heads, mask)
    return _fused_mha_hm(qkv, mask, num_heads, force == "interpret")


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
        force = _auto_impl()
    if force == "xla":
        return mha_reference(qkv, num_heads, mask)
    return _fused_mha(qkv, mask, num_heads, force == "interpret")
