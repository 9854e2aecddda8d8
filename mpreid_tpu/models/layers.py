"""Core transformer layers, TPU-first.

Parity notes against the reference CLIP implementation
(reference ``model/clip/model.py``):

* LayerNorm always accumulates in fp32 and casts back (ref ``model.py:150-156``
  keeps LN in fp32 under fp16 training; on TPU we run bf16 activations with
  the same fp32-LN policy).
* QuickGELU is ``x * sigmoid(1.702 x)`` (ref ``model.py:159-161``).
* Attention uses a packed QKV projection mirroring
  ``nn.MultiheadAttention``'s ``in_proj_weight`` layout (ref ``model.py:264``)
  so torch checkpoints map 1:1 onto our params.

All matmuls request fp32 MXU accumulation via ``preferred_element_type``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


# ---------------------------------------------------------------------------
# linear + bias + cast with an MXU bias-gradient
#
# XLA lowers the bias gradient of y = x@W + b to a convert+reduce over the
# (B·L, D) cotangent — measured at only 175-374 GB/s on the v5e (round-4
# micro-bench, ~3.7 ms of the 35.4 ms stage-2 step across all 48 bias
# reductions). The same contraction as a (8, B·L) @ (B·L, D) matmul rides
# the MXU at 664-938 GB/s (qkv 112→57 µs, c_fc 136→54 µs). This custom VJP
# keeps the forward bitwise-identical (fp32-accumulated dot + fp32 bias,
# then cast) and swaps only db's reduction for the dot form; dx/dW match
# autodiff's math exactly.
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _linear_bias_act(x, kernel, bias, out_dtype: str, accum_f32: bool):
    if accum_f32:
        # attention-projection convention: fp32 MXU accumulation + fp32
        # bias add, then one cast (bitwise = the pre-kernel layers.py math)
        y = jnp.dot(x, kernel, preferred_element_type=jnp.float32) + bias
        return y.astype(out_dtype)
    # flax-Dense convention (MLP): everything in the activation dtype — an
    # fp32-accumulated variant measured +4 ms/step on stage-2 (the f32
    # (B·L, 4D) intermediates cost ~1.2 GB of extra HBM traffic)
    return jnp.dot(x, kernel) + bias.astype(out_dtype)


def linear_bias_act(x, kernel, bias, out_dtype, accum_f32: bool = True):
    """(x @ kernel + bias).astype(out_dtype) with an MXU bias-grad VJP.

    ``out_dtype`` is canonicalized to a string — custom_vjp static args
    must be plain hashables, not numpy dtype objects."""
    return _linear_bias_act(x, kernel, bias, jnp.dtype(out_dtype).name,
                            bool(accum_f32))


def _lba_fwd(x, kernel, bias, out_dtype, accum_f32):
    # bias rides the residuals only to carry its dtype (residuals must be
    # arrays); it is O(D) — negligible
    return (_linear_bias_act(x, kernel, bias, out_dtype, accum_f32),
            (x, kernel, bias))


def _lba_bwd(out_dtype, accum_f32, res, dy):
    # All contractions keep dy/x in their native (B, L, ·) shapes — a
    # reshape(-1, d) of an L=129 tensor re-tiles T(8,128) physically
    # (measured 3.35 ms/step of pure relayout).
    x, kernel, bias = res
    b_dtype = bias.dtype
    nbatch = x.ndim - 1
    bdims = tuple(range(nbatch))
    dx = jax.lax.dot_general(
        dy, kernel, (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    dw = jax.lax.dot_general(
        x, dy, ((bdims, bdims), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(kernel.dtype)
    # db as a matmul: 8 MXU-aligned rows of ones; row 0 is the bias grad
    ones8 = jnp.ones((8,) + dy.shape[:-1], dy.dtype)
    db = jax.lax.dot_general(
        ones8, dy, ((tuple(range(1, x.ndim)), bdims), ((), ())),
        preferred_element_type=jnp.float32,
    )[0].astype(b_dtype)
    return dx, dw, db


_linear_bias_act.defvjp(_lba_fwd, _lba_bwd)


class LayerNorm(nn.Module):
    """LayerNorm with fp32 accumulation regardless of activation dtype."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        orig_dtype = x.dtype
        scale = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        return y.astype(orig_dtype)


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


class MultiHeadAttention(nn.Module):
    """Self-attention with torch ``nn.MultiheadAttention``-compatible params.

    Parameters: ``in_proj`` kernel of shape (d, 3d) and bias (3d,) packed as
    [q | k | v] along the output axis, plus ``out_proj`` dense — matching the
    reference checkpoint layout for 1:1 weight conversion.

    With ``lora_rank > 0`` a low-rank adapter ΔW = A·B·(α/r) is added to the
    QKV projection (frozen base + trained adapter — the working version of
    the reference's dormant SOLVER.LORA block, ref defaults.py:274-308,
    make_optimizer_prompt.py:154-209).
    """

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: float = 16.0
    # QKV layout: None → ops.attention.MODEL_LAYOUT default. "hm" (in-graph
    # column permute of packed params) is faster for towers whose in_proj
    # weights are FROZEN during training (no backward scatter through the
    # permute); "hm_native" STORES the params head-major (converters handle
    # torch interop) so even TRAINED towers get the tiled kernels without
    # any permute in the graph. See ops.attention.MODEL_LAYOUT.
    layout: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        # x: (B, L, D). mask: additive (L, L) or None.
        d = x.shape[-1]
        assert d == self.dim

        in_kernel = self.param(
            "in_proj_kernel", nn.initializers.xavier_uniform(), (d, 3 * d), jnp.float32
        )
        in_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,), jnp.float32)

        # Attention core: Pallas fused kernel on TPU (per-batch-element
        # scores/softmax/values resident in VMEM — no head transposes or fp32
        # score tensors in HBM), identical-math XLA einsum elsewhere. fp32
        # logits + softmax for numerical parity with torch's fp32 softmax.
        # The default "hm_native" layout STORES the in_proj params head-major
        # (converters permute at torch import/export) so the projection emits
        # per-head-contiguous [q_h|k_h|v_h] slices and the kernel grid tiles
        # (batch × head-group) — bitwise-identical math, far smaller VMEM
        # blocks than the whole-row "packed" kernel, no in-graph permute.
        # "hm" keeps torch-packed storage and permutes in-graph instead.
        from mpreid_tpu.ops import attention as attn

        # resolve_layout validates the string (typos must raise, not silently
        # run packed) and owns the None→default mapping. Towers pass an
        # explicitly per-tower-resolved layout (models/clip_model.py:68-72,
        # models/text.py:70); the vision-default fallback here only serves
        # direct module construction.
        layout = attn.resolve_layout(self.layout)
        head_major = layout in ("hm", "hm_native")
        if layout == "hm":
            perm = attn.head_major_perm(d, self.num_heads)
            in_kernel = in_kernel[:, perm]
            in_bias = in_bias[perm]
        # "hm_native": in_proj_kernel/bias (and lora_b) are ALREADY stored in
        # head-major column order — converters permute on import/export.
        qkv = linear_bias_act(x, in_kernel.astype(self.dtype), in_bias, self.dtype)
        if self.lora_rank > 0:
            lora_a = self.param(
                "lora_a", nn.initializers.normal(stddev=0.02),
                (d, self.lora_rank), jnp.float32,
            )
            lora_b = self.param(
                "lora_b", nn.initializers.zeros, (self.lora_rank, 3 * d), jnp.float32
            )
            if layout == "hm":
                lora_b = lora_b[:, perm]
            scale = self.lora_alpha / self.lora_rank
            delta = jnp.dot(
                jnp.dot(x, lora_a.astype(self.dtype),
                        preferred_element_type=jnp.float32).astype(self.dtype),
                lora_b.astype(self.dtype),
                preferred_element_type=jnp.float32,
            )
            qkv = qkv + (scale * delta).astype(self.dtype)
        if head_major:
            out = attn.fused_attention_hm(qkv, self.num_heads, mask)
        else:
            out = attn.fused_attention(qkv, self.num_heads, mask)

        out_kernel = self.param(
            "out_proj_kernel", nn.initializers.xavier_uniform(), (d, d), jnp.float32
        )
        out_bias = self.param("out_proj_bias", nn.initializers.zeros, (d,), jnp.float32)
        return linear_bias_act(out, out_kernel.astype(self.dtype), out_bias,
                               self.dtype)


class DenseLBA(nn.Module):
    """Dense with the MXU bias-grad VJP (``linear_bias_act``).

    Param names/inits match ``nn.Dense`` (kernel lecun_normal, bias zeros,
    fp32 params) so checkpoints are layout-identical, and the forward math
    is bitwise ``nn.Dense``'s (dot + bias in the activation dtype); only
    the bias GRADIENT changes — a reduce measured at 175-374 GB/s becomes
    an MXU dot (see ``linear_bias_act``)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return linear_bias_act(x, kernel.astype(self.dtype), bias, self.dtype,
                               accum_f32=False)


class MLP(nn.Module):
    """Transformer MLP: c_fc -> QuickGELU -> c_proj (ref model.py:266-270)."""

    dim: int
    hidden_mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = DenseLBA(self.dim * self.hidden_mult, dtype=self.dtype,
                     name="c_fc")(x)
        h = quick_gelu(h)
        return DenseLBA(self.dim, dtype=self.dtype, name="c_proj")(h)


class ResidualAttentionBlock(nn.Module):
    """Pre-LN transformer block (ref model.py:260-281)."""

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: float = 16.0
    layout: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        x = x + MultiHeadAttention(
            self.dim, self.num_heads, dtype=self.dtype,
            lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
            layout=self.layout, name="attn",
        )(
            LayerNorm(self.dim, name="ln_1")(x), mask
        )
        x = x + MLP(self.dim, dtype=self.dtype, name="mlp")(
            LayerNorm(self.dim, name="ln_2")(x)
        )
        return x


class BNNeck(nn.Module):
    """BatchNorm1d bottleneck with permanently-zero bias.

    The reference (``model/make_model.py:53-58``) freezes the BN bias at its
    kaiming init (zero) via ``requires_grad_(False)``. We keep a ``bias``
    parameter for checkpoint-layout compatibility but it is zero-initialized
    and masked out of every optimizer (see solver.optim.trainable_mask).
    """

    dim: int
    momentum: float = 0.9  # torch BN default momentum 0.1 => EMA decay 0.9
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.dim,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.dim,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)

        x32 = x.astype(jnp.float32)
        if train:
            mean = jnp.mean(x32, axis=0)
            var = jnp.var(x32, axis=0)
            n = x.shape[0]
            # torch tracks *unbiased* variance in running stats.
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return y.astype(x.dtype)


class MarginHead(nn.Module):
    """Margin classifier head — the wired version of ``MODEL.COS_LAYER``.

    The reference stores the flag (``model/make_model.py:34``) but never
    consumes it, and its margin modules (``loss/metric_learning.py:45-188``,
    ``loss/arcface.py``) are unreachable from any pipeline. Here the flag
    selects this head in place of the plain bias-free Dense classifier: it
    holds the (num_classes, feat) weight and emits margin logits at train
    time (labels required). With ``labels=None`` (eval) it returns plain
    scaled cosine logits, the standard ArcFace/CosFace inference behavior.
    """

    num_classes: int
    kind: str = "arcface"  # arcface | cosface | amsoftmax | circle
    # None → the kind's reference default (30, or 256 for circle — ref
    # arcface.py:9,53). One resolved scale is used for BOTH the margin
    # training logits and the plain scaled-cosine eval logits, so scores
    # keep the same magnitude across train/eval.
    scale: Optional[float] = None

    @property
    def effective_scale(self) -> float:
        if self.scale is not None:
            return self.scale
        return 256.0 if self.kind == "circle" else 30.0

    @nn.compact
    def __call__(self, features: jax.Array, labels: Optional[jax.Array] = None) -> jax.Array:
        from mpreid_tpu.losses import margin as M

        weight = self.param(
            "weight", nn.initializers.normal(stddev=0.001),
            (self.num_classes, features.shape[-1]), jnp.float32,
        )
        s = self.effective_scale
        if labels is None:
            return s * M._cosine_logits(features, weight)
        if self.kind == "arcface":
            return M.arcface_logits(features, weight, labels, s=s)
        if self.kind == "cosface":
            return M.cosface_logits(features, weight, labels, s=s)
        if self.kind == "amsoftmax":
            return M.amsoftmax_logits(features, weight.T, labels, s=s)
        if self.kind == "circle":
            return M.circle_logits(features, weight, labels, s=s)
        raise ValueError(
            f"Unknown MODEL.COS_LAYER_TYPE {self.kind!r}; expected "
            "arcface|cosface|amsoftmax|circle"
        )


def classifier_init(key, shape, dtype=jnp.float32):
    """Bias-free classifier init, normal std 0.001 (ref make_model.py:23-28)."""
    return nn.initializers.normal(stddev=0.001)(key, shape, dtype)


def make_classifier(num_classes: int, cos_layer: str = ""):
    """Classifier head per MODEL.COS_LAYER: plain bias-free Dense (ref
    make_model.py:48-51) or a MarginHead of the given kind."""
    if cos_layer:
        return MarginHead(num_classes, kind=cos_layer)
    return nn.Dense(
        num_classes, use_bias=False, kernel_init=classifier_init,
        dtype=jnp.float32, param_dtype=jnp.float32,
    )


def classifier_scores(classifier, cos_layer: str, feats: jax.Array, labels):
    """Train-time logits: margin heads need the labels, Dense does not."""
    if cos_layer:
        return classifier(feats, labels)
    return classifier(feats)
