"""CLIP text transformer in Flax.

Behavioral contract (reference ``model/clip/model.py:332-340,582-624`` and the
Uni-Prompt ``TextEncoder`` wrapper at ``model/make_model_uniprompt.py:49-68``):

* causal (upper-triangular -inf) additive attention mask over 77 tokens,
* token embedding + learned positional embedding, L pre-LN blocks, ``ln_final``,
* pooled feature = hidden state at the EOT position (argmax of token ids)
  projected through ``text_projection``.

Exposes two entry points:
  * ``encode_tokens``  — from integer token ids (CLIP ``encode_text``),
  * ``encode_embeddings`` — from precomputed prompt embeddings (PromptLearner
    path), where EOT positions come from the tokenized template.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import LayerNorm, ResidualAttentionBlock


def causal_mask(length: int) -> jax.Array:
    """Additive upper-triangular -inf mask (ref model.py:582-588)."""
    mask = jnp.full((length, length), -jnp.inf, dtype=jnp.float32)
    return jnp.triu(mask, k=1)


class TextTransformer(nn.Module):
    context_length: int
    vocab_size: int
    width: int
    heads: int
    layers: int
    embed_dim: int
    dtype: jnp.dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: float = 16.0
    # attention QKV layout; None → ops.attention.TEXT_LAYOUT ("hm": measured
    # faster for this tower, whose in_proj weights are frozen in every
    # training stage — tools/bench_stages_ab.py). "hm_native" additionally
    # stores the params head-major, removing the per-step forward gather.
    layout: Optional[str] = None

    def setup(self):
        self.token_embedding = nn.Embed(
            self.vocab_size,
            self.width,
            embedding_init=nn.initializers.normal(stddev=0.02),
            param_dtype=jnp.float32,
            name="token_embedding",
        )
        self.positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=0.01),
            (self.context_length, self.width),
            jnp.float32,
        )
        from mpreid_tpu.ops import attention as attn

        self.resblocks = [
            ResidualAttentionBlock(
                self.width, self.heads, dtype=self.dtype,
                lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
                layout=attn.resolve_layout(self.layout, tower="text"),
                name=f"resblocks_{i}",
            )
            for i in range(self.layers)
        ]
        self.ln_final = LayerNorm(self.width, name="ln_final")
        self.text_projection = self.param(
            "text_projection",
            nn.initializers.normal(stddev=self.width**-0.5),
            (self.width, self.embed_dim),
            jnp.float32,
        )

    def embed(self, tokens: jax.Array) -> jax.Array:
        """Token ids (B, L) → embeddings (B, L, width), before pos-embed."""
        return self.token_embedding(tokens).astype(self.dtype)

    def _run(self, x: jax.Array, eot_indices: jax.Array) -> jax.Array:
        x = x.astype(self.dtype) + self.positional_embedding.astype(self.dtype)
        mask = causal_mask(x.shape[1])
        for block in self.resblocks:
            x = block(x, mask)
        x = self.ln_final(x)
        pooled = jnp.take_along_axis(x, eot_indices[:, None, None], axis=1)[:, 0]
        return jnp.dot(
            pooled,
            self.text_projection.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)

    def encode_tokens(self, tokens: jax.Array) -> jax.Array:
        """CLIP encode_text (ref model.py:609-624): tokens (B, 77) → (B, embed_dim)."""
        eot = jnp.argmax(tokens, axis=-1)
        return self._run(self.embed(tokens), eot)

    def encode_embeddings(
        self, prompt_embeddings: jax.Array, tokenized_prompts: jax.Array
    ) -> jax.Array:
        """Uni-Prompt TextEncoder (ref make_model_uniprompt.py:58-68)."""
        eot = jnp.argmax(tokenized_prompts, axis=-1)
        if eot.shape[0] == 1 and prompt_embeddings.shape[0] > 1:
            eot = jnp.broadcast_to(eot, (prompt_embeddings.shape[0],))
        return self._run(prompt_embeddings, eot)

    def __call__(self, tokens: jax.Array) -> jax.Array:
        return self.encode_tokens(tokens)
