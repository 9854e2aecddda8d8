"""Attention QKV layout tests: packed / "hm" / "hm_native" equivalence.

"hm_native" stores in_proj params head-major (converters permute columns at
torch import/export) so trained towers get the head-tiled kernels without an
in-graph permute. These tests pin:

* the permutation round-trip (perm ∘ inverse == identity),
* bit-level output equivalence of all three layouts for the same effective
  weights (module level, incl. LoRA),
* converter import correctness: a torch-layout state_dict loaded into an
  "hm_native" model produces the same eval features / text features as the
  packed model (uniprompt model → both towers),
* export correctness: the exported state_dict of an "hm_native" model is
  value-identical to the packed model's export (torch packing restored).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpreid_tpu.ops import attention as attn

from tiny import tiny_cfg, tiny_model


def test_resolve_layout_validates():
    # defaults resolve; typos raise instead of silently running packed
    assert attn.resolve_layout(None) in attn.VALID_LAYOUTS
    assert attn.resolve_layout("", tower="text") in attn.VALID_LAYOUTS
    for good in attn.VALID_LAYOUTS:
        assert attn.resolve_layout(good) == good
    with pytest.raises(ValueError, match="hm-native"):
        attn.resolve_layout("hm-native")
    with pytest.raises(ValueError):
        attn.resolve_layout("headmajor", tower="text")


def test_perm_inverse_roundtrip():
    for d, h in [(64, 4), (768, 12), (512, 8), (64, 1)]:
        perm = attn.head_major_perm(d, h)
        inv = attn.head_major_perm_inverse(d, h)
        x = np.arange(3 * d)
        np.testing.assert_array_equal(x[perm][inv], x)
        np.testing.assert_array_equal(x[inv][perm], x)


@pytest.mark.parametrize("lora", [0, 3])
def test_mha_layout_equivalence(lora):
    from mpreid_tpu.models.layers import MultiHeadAttention

    d, h, b, l = 64, 4, 3, 9
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, l, d).astype(np.float32))
    perm = attn.head_major_perm(d, h)

    m_packed = MultiHeadAttention(d, h, layout="packed", lora_rank=lora)
    m_hm = MultiHeadAttention(d, h, layout="hm", lora_rank=lora)
    m_nat = MultiHeadAttention(d, h, layout="hm_native", lora_rank=lora)

    v = m_packed.init(jax.random.PRNGKey(0), x)
    if lora:
        # non-zero lora_b so the adapter actually contributes
        import flax

        v = flax.core.unfreeze(v)
        v["params"]["lora_b"] = jnp.asarray(
            rng.randn(lora, 3 * d).astype(np.float32) * 0.1
        )

    out_p = m_packed.apply(v, x)
    out_h = m_hm.apply(v, x)

    import flax

    vn = flax.core.unfreeze(v)
    vn["params"] = dict(vn["params"])
    vn["params"]["in_proj_kernel"] = v["params"]["in_proj_kernel"][:, perm]
    vn["params"]["in_proj_bias"] = v["params"]["in_proj_bias"][perm]
    if lora:
        vn["params"]["lora_b"] = v["params"]["lora_b"][:, perm]
    out_n = m_nat.apply(vn, x)

    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_h), atol=2e-6)
    np.testing.assert_allclose(np.asarray(out_h), np.asarray(out_n), atol=0)

    # gradients flow through the native path (trained-tower use case)
    g = jax.grad(lambda vv: float(0) + jnp.sum(jnp.square(m_nat.apply(vv, x))))(vn)
    assert bool(jnp.all(jnp.isfinite(g["params"]["in_proj_kernel"])))


def _native_clip(clip_config):
    return dataclasses.replace(
        clip_config, vision_layout="hm_native", text_layout="hm_native"
    )


_MULTIHEAD_OVERRIDES = dict(
    vision_width=128,            # 2 heads — perms must be non-trivial
    transformer_width=128,
    transformer_heads=2,
)


def _models_and_vars():
    """(packed model, native model, packed vars, native vars) sharing one
    torch-layout checkpoint — the converter is the bridge. The packed side
    is EXPLICIT (hm_native is the default layout since round 3)."""
    from mpreid_tpu.models.convert import apply_overlay, convert_reid_state_dict
    from test_convert import torch_layout_from_variables

    cfg = tiny_cfg()
    model, variables = tiny_model(
        cfg, num_classes=5, uniprompt=True,
        clip_overrides=dict(
            _MULTIHEAD_OVERRIDES, vision_layout="packed", text_layout="packed"
        ),
    )
    native_model = dataclasses.replace(
        model, clip_config=_native_clip(model.clip_config)
    )
    sd = torch_layout_from_variables(variables, uniprompt=True, model=model)
    overlay = convert_reid_state_dict(sd, native_model)
    # base native vars: identical init (token_embedding etc. are shared);
    # every attention param is overwritten by the overlay
    native_vars = apply_overlay(variables, overlay)
    return model, native_model, variables, native_vars


def test_hm_native_model_matches_packed_via_converter():
    from mpreid_tpu.models.uniprompt import UniPromptReID

    model, native_model, variables, native_vars = _models_and_vars()
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 32, 16, 3).astype(np.float32))

    f_packed = model.apply(variables, x, train=False)
    f_native = native_model.apply(native_vars, x, train=False)
    np.testing.assert_allclose(
        np.asarray(f_packed), np.asarray(f_native), atol=1e-5
    )

    lbl = jnp.arange(3)
    view = jnp.asarray([0, 6, 13])
    t_packed = model.apply(variables, lbl, view, "1b", method=UniPromptReID.get_text)
    t_native = native_model.apply(
        native_vars, lbl, view, "1b", method=UniPromptReID.get_text
    )
    np.testing.assert_allclose(
        np.asarray(t_packed), np.asarray(t_native), atol=1e-5
    )


def test_hm_native_export_restores_torch_packing():
    from mpreid_tpu.models.convert import export_reid_state_dict

    model, native_model, variables, native_vars = _models_and_vars()
    sd_packed = export_reid_state_dict(variables, model)
    sd_native = export_reid_state_dict(native_vars, native_model)
    assert set(sd_packed) == set(sd_native)
    for k in sd_packed:
        np.testing.assert_allclose(
            np.asarray(sd_packed[k]), np.asarray(sd_native[k]), atol=0,
            err_msg=k,
        )


def test_vision_transformer_layout_thread():
    """VisionTransformer threads layout to every block (incl. MoE blocks)."""
    from mpreid_tpu.models.vit import VisionTransformer

    kwargs = dict(
        h_resolution=2, w_resolution=1, patch_size=16, stride_size=16,
        width=128, layers=2, heads=2, output_dim=32,
    )
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 32, 16, 3).astype(np.float32))

    vt_packed = VisionTransformer(layout="packed", **kwargs)
    vt_native = VisionTransformer(layout="hm_native", **kwargs)
    v = vt_packed.init(jax.random.PRNGKey(0), x)

    perm = attn.head_major_perm(128, 2)
    import flax

    vn = flax.core.unfreeze(v)
    for blk in ("resblocks_0", "resblocks_1"):
        a = dict(vn["params"][blk]["attn"])
        a["in_proj_kernel"] = a["in_proj_kernel"][:, perm]
        a["in_proj_bias"] = a["in_proj_bias"][perm]
        vn["params"][blk] = {**vn["params"][blk], "attn": a}

    o_p = vt_packed.apply(v, x)
    o_n = vt_native.apply(vn, x)
    for a, b in zip(o_p[:3], o_n[:3]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # MoE variant accepts and uses the layout too
    vt_moe = VisionTransformer(
        layout="hm_native", num_experts=2, top_k=1, moe_layers=1, **kwargs
    )
    vm = vt_moe.init(jax.random.PRNGKey(0), x)
    out = vt_moe.apply(vm, x)
    assert all(bool(jnp.all(jnp.isfinite(t))) for t in out[:3])


class TestCheckpointStorageTag:
    """Checkpoints record the attention param storage layout; loads verify
    it against the active config instead of silently reinterpreting packed
    columns as head-major (round-3 review finding)."""

    def _params(self):
        z = jnp.zeros((8, 24), jnp.float32)
        return {
            "visual": {"resblocks_0": {"attn": {"in_proj_kernel": z,
                                                "in_proj_bias": z[0]}}},
            "text": {"resblocks_0": {"attn": {"in_proj_kernel": z,
                                              "in_proj_bias": z[0]}}},
        }

    def _cfg(self, layout):
        from mpreid_tpu.config import get_default_cfg

        cfg = get_default_cfg()
        cfg.MODEL.ATTN_LAYOUT_VISION = layout
        cfg.MODEL.ATTN_LAYOUT_TEXT = layout
        return cfg

    def test_roundtrip_and_mismatch(self, tmp_path):
        from mpreid_tpu.utils.checkpoint import load_weights, save_weights

        params = self._params()
        save_weights(str(tmp_path / "ck"), params, cfg=self._cfg("hm_native"))
        # matching layout loads fine
        out = load_weights(str(tmp_path / "ck"), {"params": params},
                           cfg=self._cfg("hm_native"))
        assert "params" in out
        # mismatched layout is a hard error, not silent corruption
        with pytest.raises(ValueError, match="storage mismatch"):
            load_weights(str(tmp_path / "ck"), {"params": params},
                         cfg=self._cfg("packed"))
        # "hm" stores packed too — a packed-tagged checkpoint loads under it
        save_weights(str(tmp_path / "ck2"), params, cfg=self._cfg("hm"))
        load_weights(str(tmp_path / "ck2"), {"params": params},
                     cfg=self._cfg("packed"))

    def test_untagged_assumed_packed(self):
        from mpreid_tpu.utils.checkpoint import check_attn_storage

        # pre-tag checkpoints (no head-major storage existed) pass a packed
        # expectation and fail a head-major one
        check_attn_storage({"params": self._params()}, self._cfg("packed"))
        with pytest.raises(ValueError, match="storage mismatch"):
            check_attn_storage({"params": self._params()},
                               self._cfg("hm_native"))

    def test_no_attention_leaves_skips_check(self):
        from mpreid_tpu.utils.checkpoint import check_attn_storage

        # RN50-style trees (no in_proj leaves) are layout-agnostic
        check_attn_storage(
            {"params": {"layer1": {"kernel": jnp.zeros((3, 3))}}},
            self._cfg("packed"),
        )
