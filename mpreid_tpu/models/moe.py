"""Mixture-of-Experts vision blocks, TPU-native.

The reference implements MoE dispatch as a serial Python loop over experts
with boolean indexing + ``index_add_`` (reference ``model/clip/model.py:
226-245``) — data-dependent shapes that cannot compile under XLA. Here
dispatch is a dense one-hot-weighted einsum over a stacked expert parameter
tensor: every expert runs on every token on the MXU and results are mixed by
the (mostly-zero) routing weights. At reference scale (77–197 tokens, ≤8
experts) this is faster than gather/scatter on TPU and is exactly equivalent
numerically.

Also provides the Switch-Transformer load-balancing loss (reference
``model/clip/model.py:342-377``) and the reference's shared-first-block
routing-decision scheme (``model.py:304-330``).

Expert parallelism: the stacked expert tensors carry a leading ``experts``
axis which the parallel layer (parallel/mesh.py) shards over the ``model``
mesh axis when EP is enabled.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import LayerNorm, MultiHeadAttention, quick_gelu


def topk_routing(
    router_logits: jax.Array, top_k: int
) -> Tuple[jax.Array, jax.Array]:
    """Softmax → top-k → renormalize (reference model.py:204-211).

    Args:
      router_logits: (N, E) gate logits.
      top_k: experts per token.

    Returns:
      combine_weights: (N, E) dense routing weights (zero off the top-k),
      selected: (N, top_k) expert indices.
    """
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    top_vals, selected = jax.lax.top_k(probs, top_k)
    top_vals = top_vals / jnp.sum(top_vals, axis=-1, keepdims=True)
    one_hot = jax.nn.one_hot(selected, probs.shape[-1], dtype=top_vals.dtype)
    combine = jnp.einsum("nk,nke->ne", top_vals, one_hot)
    return combine, selected


def load_balancing_loss(router_logits: jax.Array, top_k: int) -> jax.Array:
    """Switch-Transformer aux loss (reference model.py:342-377)."""
    num_experts = router_logits.shape[-1]
    logits = router_logits.reshape(-1, num_experts).astype(jnp.float32)
    routing_weights = jax.nn.softmax(logits, axis=-1)
    _, selected = jax.lax.top_k(routing_weights, top_k)
    expert_mask = jax.nn.one_hot(selected, num_experts, dtype=jnp.float32)
    tokens_per_expert = jnp.mean(expert_mask, axis=0)        # (top_k, E)
    router_prob_per_expert = jnp.mean(routing_weights, axis=0)  # (E,)
    return jnp.sum(tokens_per_expert * router_prob_per_expert) * num_experts


class ExpertMLPs(nn.Module):
    """E stacked transformer MLPs: (E, D, 4D) and (E, 4D, D) kernels."""

    dim: int
    num_experts: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, combine_weights: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        # x: (N, D); combine_weights: (N, E)
        e, d = self.num_experts, self.dim
        fc_kernel = self.param(
            "c_fc_kernel",
            nn.initializers.normal(stddev=(2 * d) ** -0.5),
            (e, d, 4 * d),
            jnp.float32,
        )
        fc_bias = self.param("c_fc_bias", nn.initializers.zeros, (e, 4 * d), jnp.float32)
        proj_kernel = self.param(
            "c_proj_kernel",
            nn.initializers.normal(stddev=d**-0.5),
            (e, 4 * d, d),
            jnp.float32,
        )
        proj_bias = self.param("c_proj_bias", nn.initializers.zeros, (e, d), jnp.float32)

        h = jnp.einsum(
            "nd,edh->enh", x, fc_kernel.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype) + fc_bias[:, None, :].astype(self.dtype)
        h = quick_gelu(h)
        if self.dropout > 0 and not deterministic:
            h = nn.Dropout(rate=self.dropout)(h, deterministic=False)
        y = jnp.einsum(
            "enh,ehd->end", h, proj_kernel.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype) + proj_bias[:, None, :].astype(self.dtype)
        # Mix experts by routing weight: (E, N, D) × (N, E) → (N, D)
        return jnp.einsum(
            "end,ne->nd", y, combine_weights.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)


class MoEResidualAttentionBlock(nn.Module):
    """Pre-LN block whose MLP is a top-k routed expert mixture.

    Mirrors reference ``model.py:163-258``: attention → LN → gate (optional,
    may reuse a routing decision computed by an earlier block) → experts →
    residual.
    """

    dim: int
    num_heads: int
    num_experts: int
    top_k: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: float = 16.0
    layout: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        routing: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, Optional[jax.Array], jax.Array]:
        """Returns (output, router_logits_or_None, combine_weights)."""
        b, l, d = x.shape
        x = x + MultiHeadAttention(
            self.dim, self.num_heads, dtype=self.dtype,
            lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
            layout=self.layout, name="attn",
        )(
            LayerNorm(self.dim, name="ln_1")(x), mask
        )
        hidden = LayerNorm(self.dim, name="ln_2")(x)
        flat = hidden.reshape(-1, d)

        gate_kernel = self.param(
            "gate_kernel", nn.initializers.lecun_normal(), (d, self.num_experts), jnp.float32
        )
        router_logits = None
        if routing is None:
            router_logits = jnp.dot(
                flat, gate_kernel.astype(self.dtype), preferred_element_type=jnp.float32
            )
            combine, _ = topk_routing(router_logits, self.top_k)
        else:
            combine = routing

        mixed = ExpertMLPs(
            self.dim, self.num_experts, self.dropout, dtype=self.dtype, name="experts"
        )(flat, combine, deterministic=deterministic)
        out = x + mixed.reshape(b, l, d)
        return out, router_logits, combine
