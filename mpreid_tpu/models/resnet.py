"""ModifiedResNet (CLIP RN50) in Flax.

Behavioral contract (reference ``model/clip/model.py:10-148``):

* 3-conv stem with BN+ReLU, then 2x2 average pool,
* anti-aliased Bottleneck blocks: stride>1 is realized as avgpool-then-conv
  both in the residual branch and the downsample path,
* layer4 has stride 1 (ReID modification),
* final AttentionPool2d (QKV attention with a mean-token query set) instead of
  global average pooling,
* forward returns (x3, x4, xproj): layer3 feature map, layer4 feature map,
  and attention-pooled tokens — the assembly layer average-pools x3/x4 and
  takes xproj[0] (ref ``make_model.py:82-86``).

TPU notes: NHWC layout throughout, fp32 BatchNorm statistics, bf16 conv
compute.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


class _BN2d(nn.Module):
    """BatchNorm2d with torch semantics: biased batch variance for
    normalization, UNBIASED variance in the running stats (flax's
    nn.BatchNorm tracks the biased one — a parity drift vs torch)."""

    features: int
    momentum: float = 0.9  # EMA decay = 1 − torch momentum (0.1)
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)

        x32 = x.astype(jnp.float32)
        if train:
            mean = jnp.mean(x32, axis=(0, 1, 2))
            var = jnp.var(x32, axis=(0, 1, 2))
            n = x.shape[0] * x.shape[1] * x.shape[2]
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return y.astype(x.dtype)


class _BN(nn.Module):
    """Named wrapper keeping the checkpoint subtree layout ({name}/bn/...)."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return _BN2d(self.features, name="bn")(x, train)


def _avg_pool(x: jax.Array, window: int) -> jax.Array:
    return nn.avg_pool(x, (window, window), strides=(window, window))


class Bottleneck(nn.Module):
    inplanes: int
    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        conv = lambda f, k, name: nn.Conv(
            f, (k, k), padding="SAME" if k > 1 else "VALID", use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )
        out = nn.relu(_BN(self.planes, name="bn1")(conv(self.planes, 1, "conv1")(x), train))
        out = nn.relu(_BN(self.planes, name="bn2")(conv(self.planes, 3, "conv2")(out), train))
        if self.stride > 1:
            out = _avg_pool(out, self.stride)
        out = _BN(self.planes * self.expansion, name="bn3")(
            conv(self.planes * self.expansion, 1, "conv3")(out), train
        )

        identity = x
        if self.stride > 1 or self.inplanes != self.planes * self.expansion:
            identity = x
            if self.stride > 1:
                identity = _avg_pool(identity, self.stride)
            identity = conv(self.planes * self.expansion, 1, "downsample_conv")(identity)
            identity = _BN(self.planes * self.expansion, name="downsample_bn")(identity, train)

        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    """QKV attention pooling (reference model.py:56-90).

    Input NHWC feature map → tokens [(mean, hw...)] + pos embed → MHA where
    every token attends to every token; returns all output tokens (L, B, C) to
    mirror the reference's return convention (callers take index 0).
    """

    spacial_dim: int
    embed_dim: int
    num_heads: int
    output_dim: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        out_dim = self.output_dim or self.embed_dim
        tokens = x.reshape(b, h * w, c)
        mean = jnp.mean(tokens, axis=1, keepdims=True)
        tokens = jnp.concatenate([mean, tokens], axis=1)  # (B, 1+HW, C)

        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=self.embed_dim**-0.5),
            (self.spacial_dim + 1, self.embed_dim),
            jnp.float32,
        )
        tokens = tokens + pos.astype(self.dtype)

        dense = lambda f, name: nn.Dense(
            f, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        q = dense(self.embed_dim, "q_proj")(tokens)
        k = dense(self.embed_dim, "k_proj")(tokens)
        v = dense(self.embed_dim, "v_proj")(tokens)

        head_dim = self.embed_dim // self.num_heads
        split = lambda t: t.reshape(b, -1, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q * head_dim**-0.5, k, preferred_element_type=jnp.float32
        )
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32)
        out = out.astype(self.dtype).transpose(0, 2, 1, 3).reshape(b, -1, self.embed_dim)
        out = dense(out_dim, "c_proj")(out)
        return out.transpose(1, 0, 2)  # (L, B, out_dim) — ref returns LND


class ModifiedResNet(nn.Module):
    layers: Tuple[int, int, int, int]
    output_dim: int
    heads: int
    input_resolution: int  # h_resolution * w_resolution of the attnpool grid
    width: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, cv_emb: Optional[jax.Array] = None, train: bool = False,
        deterministic: bool = True,
    ):
        del cv_emb, deterministic  # SIE applies to the ViT path only
        w = self.width
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )
        x = x.astype(self.dtype)
        x = nn.relu(_BN(w // 2, name="bn1")(conv(w // 2, 3, 2, "conv1")(x), train))
        x = nn.relu(_BN(w // 2, name="bn2")(conv(w // 2, 3, 1, "conv2")(x), train))
        x = nn.relu(_BN(w, name="bn3")(conv(w, 3, 1, "conv3")(x), train))
        x = _avg_pool(x, 2)

        inplanes = w
        stage_specs = [
            (w, self.layers[0], 1, "layer1"),
            (w * 2, self.layers[1], 2, "layer2"),
            (w * 4, self.layers[2], 2, "layer3"),
            (w * 8, self.layers[3], 1, "layer4"),  # stride 1: ReID modification
        ]
        feats = {}
        for planes, blocks, stride, name in stage_specs:
            x = Bottleneck(inplanes, planes, stride, dtype=self.dtype, name=f"{name}_0")(x, train)
            inplanes = planes * Bottleneck.expansion
            for i in range(1, blocks):
                x = Bottleneck(inplanes, planes, dtype=self.dtype, name=f"{name}_{i}")(x, train)
            feats[name] = x

        embed_dim = w * 32
        xproj = AttentionPool2d(
            self.input_resolution, embed_dim, self.heads, self.output_dim,
            dtype=self.dtype, name="attnpool",
        )(feats["layer4"])
        # (x3, x4, xproj) — ref model.py:133-148
        return feats["layer3"], feats["layer4"], xproj, None
