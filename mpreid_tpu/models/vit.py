"""CLIP VisionTransformer in Flax, with optional MoE layers.

Behavioral contract (reference ``model/clip/model.py:379-479``):

* patchify with a bias-free conv (patch_size kernel, stride_size stride),
* prepend a class token, optionally add a camera/view (SIE) embedding to the
  class token, add a resizable positional embedding, ``ln_pre``,
* run L transformer blocks; the output exposes THREE tensors:
  ``x11`` (tokens after L-1 blocks, un-normalized), ``x12`` (tokens after all
  L blocks, passed through ``ln_post``) and ``xproj = x12 @ proj``,
* with MoE enabled the first ``moe_layers`` blocks route their MLPs through
  experts; the first MoE block's routing decision is (optionally) reused by
  the later MoE blocks and its router logits are returned for the
  load-balancing loss (reference ``model.py:304-330``). In the MoE path the
  reference collapses x11 := x12 := final tokens (``model.py:450-454``) —
  preserved here.

TPU notes: activations run in ``dtype`` (bf16 by default), LayerNorm and
softmax accumulate fp32, blocks may be rematerialized (``remat=True``) to
trade FLOPs for HBM.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import LayerNorm, ResidualAttentionBlock
from .moe import MoEResidualAttentionBlock


class PatchEmbed(nn.Module):
    """Patchify as reshape + matmul (stride == patch only).

    Keeps the exact ``conv1/kernel`` param name/shape of the nn.Conv it
    replaces — checkpoints and converters are layout-identical. Math equals
    VALID conv with stride == kernel: out[b,i,j,:] = vec(patch_ij) @ vec(W).
    """

    patch_size: int
    width: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        p, w = self.patch_size, self.width
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (p, p, 3, w), jnp.float32
        )
        b, h, wd, c = x.shape
        # VALID-conv semantics: a trailing remainder smaller than one patch
        # is cropped, exactly as the strided conv would drop it
        if h % p or wd % p:
            x = x[:, : h // p * p, : wd // p * p, :]
        x = x.reshape(b, h // p, p, wd // p, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (h // p) * (wd // p), p * p * c)
        out = jnp.dot(
            x.astype(self.dtype),
            kernel.reshape(p * p * c, w).astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        return out.astype(self.dtype)


class VisionTransformer(nn.Module):
    h_resolution: int
    w_resolution: int
    patch_size: int
    stride_size: int
    width: int
    layers: int
    heads: int
    output_dim: int
    num_experts: int = 0
    top_k: int = 0
    moe_layers: int = 0
    dropout: float = 0.0
    shared_routing: bool = True
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    lora_rank: int = 0
    lora_alpha: float = 16.0
    # attention QKV layout (None → ops.attention.MODEL_LAYOUT; "hm_native"
    # stores in_proj params head-major — see models/layers.py)
    layout: Optional[str] = None

    @property
    def use_moe(self) -> bool:
        return self.num_experts > 0 and self.top_k > 0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        cv_emb: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array, jax.Array, Optional[jax.Array]]:
        """x: (B, H, W, 3) image batch (NHWC). Returns (x11, x12, xproj, router_logits)."""
        b = x.shape[0]
        w = self.width
        scale = w**-0.5

        if self.stride_size == self.patch_size:
            # Non-overlapping patches: the conv is exactly a space-to-depth
            # reshape + one (B·hw, p·p·3) × (p·p·3, w) matmul — the direct
            # MXU form of patchify. (Measured step-time parity with XLA's
            # conv lowering on the v5e; kept for its explicitness and for
            # shapes where the conv lowering is less fortunate.)
            x = PatchEmbed(
                patch_size=self.patch_size, width=w, dtype=self.dtype,
                name="conv1",
            )(x)
        else:
            # overlapping patches (stride < patch, e.g. stride 12): real conv
            x = nn.Conv(
                features=w,
                kernel_size=(self.patch_size, self.patch_size),
                strides=(self.stride_size, self.stride_size),
                padding="VALID",
                use_bias=False,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="conv1",
            )(x.astype(self.dtype))
            x = x.reshape(b, -1, w)  # (B, hw, width)

        class_embedding = self.param(
            "class_embedding", nn.initializers.normal(stddev=scale), (w,), jnp.float32
        )
        positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=scale),
            (self.h_resolution * self.w_resolution + 1, w),
            jnp.float32,
        )

        cls = jnp.broadcast_to(class_embedding.astype(self.dtype), (b, 1, w))
        if cv_emb is not None:
            # SIE embedding added to the class token only (ref model.py:420-421)
            cls = cls + cv_emb[:, None, :].astype(self.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        x = x + positional_embedding.astype(self.dtype)
        x = LayerNorm(w, name="ln_pre")(x)

        block_cls = ResidualAttentionBlock
        moe_cls = MoEResidualAttentionBlock
        if self.remat:
            block_cls = nn.remat(ResidualAttentionBlock, static_argnums=())
            moe_cls = nn.remat(MoEResidualAttentionBlock, static_argnums=(4,))

        router_logits = None
        if self.use_moe:
            n_moe = self.layers if self.moe_layers == -1 else min(self.moe_layers, self.layers)
            routing = None
            all_logits = []
            for i in range(n_moe):
                x, logits_i, combine_i = moe_cls(
                    w,
                    self.heads,
                    self.num_experts,
                    self.top_k,
                    self.dropout,
                    dtype=self.dtype,
                    lora_rank=self.lora_rank,
                    lora_alpha=self.lora_alpha,
                    layout=self.layout,
                    name=f"moe_resblocks_{i}",
                )(x, None, routing=routing, deterministic=deterministic)
                if logits_i is not None:
                    # every independently-routing block contributes to the
                    # balancing loss (with shared routing only block 0 gates)
                    all_logits.append(logits_i)
                if i == 0 and self.shared_routing:
                    routing = combine_i
            router_logits = jnp.stack(all_logits) if all_logits else None
            for i in range(n_moe, self.layers):
                x = block_cls(w, self.heads, dtype=self.dtype,
                              lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
                              layout=self.layout, name=f"resblocks_{i}")(x)
            x11 = x12 = x  # ref model.py:450-454
        else:
            for i in range(self.layers - 1):
                x = block_cls(w, self.heads, dtype=self.dtype,
                              lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
                              layout=self.layout, name=f"resblocks_{i}")(x)
            x11 = x
            x12 = block_cls(
                w, self.heads, dtype=self.dtype,
                lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
                layout=self.layout, name=f"resblocks_{self.layers - 1}"
            )(x11)

        x12 = LayerNorm(w, name="ln_post")(x12)

        proj = self.param(
            "proj", nn.initializers.normal(stddev=scale), (w, self.output_dim), jnp.float32
        )
        xproj = jnp.dot(
            x12, proj.astype(self.dtype), preferred_element_type=jnp.float32
        ).astype(self.dtype)

        return x11, x12, xproj, router_logits


def resize_pos_embed(
    posemb: jax.Array, gs_new_h: int, gs_new_w: int
) -> jax.Array:
    """Bilinearly resize a (1+gs_old², D) positional embedding to a new grid.

    Matches reference ``clip/model.py:731-747`` (F.interpolate bilinear,
    align_corners=False — jax.image.resize 'linear' has the same semantics).
    """
    import math

    posemb_token, posemb_grid = posemb[:1], posemb[1:]
    gs_old = int(math.sqrt(posemb_grid.shape[0]))
    d = posemb_grid.shape[-1]
    grid = posemb_grid.reshape(gs_old, gs_old, d)
    # antialias=False: F.interpolate(bilinear) does not low-pass on
    # downsampling; jax.image.resize would by default.
    grid = jax.image.resize(
        grid, (gs_new_h, gs_new_w, d), method="linear", antialias=False
    )
    grid = grid.reshape(gs_new_h * gs_new_w, d)
    return jnp.concatenate([posemb_token, grid], axis=0)
