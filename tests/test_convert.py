"""Round-trip test for the trained-reference-checkpoint importer.

Builds a torch-layout state_dict *from* our model's variables via the
inverse mapping, runs the converter, and requires the result to reproduce
the original variables exactly — validating every transpose/rename.
"""

import jax
import numpy as np
import pytest

from mpreid_tpu.models.convert import apply_overlay, convert_reid_state_dict

from tiny import tiny_cfg, tiny_model


def torch_layout_from_variables(v, uniprompt: bool, model=None):
    """Inverse mapping: our variables → reference state_dict key layout.

    ``model`` (when given) supplies clip_config so "hm_native"-layout
    in_proj params are restored to torch [q|k|v] packing — required since
    hm_native became the default storage layout."""
    p = v["params"]
    bs = v["batch_stats"]
    sd = {}
    inv = {"vision": None, "text": None}
    if model is not None:
        inv = {t: model.clip_config._perm_inverse(t) for t in ("vision", "text")}

    def put_block(prefix, blk, tower="vision"):
        in_kernel = np.asarray(blk["attn"]["in_proj_kernel"])
        in_bias = np.asarray(blk["attn"]["in_proj_bias"])
        if inv[tower] is not None:
            in_kernel = in_kernel[:, inv[tower]]
            in_bias = in_bias[inv[tower]]
        sd[f"{prefix}.attn.in_proj_weight"] = in_kernel.T
        sd[f"{prefix}.attn.in_proj_bias"] = in_bias
        sd[f"{prefix}.attn.out_proj.weight"] = np.asarray(blk["attn"]["out_proj_kernel"]).T
        sd[f"{prefix}.attn.out_proj.bias"] = np.asarray(blk["attn"]["out_proj_bias"])
        for ln in ("ln_1", "ln_2"):
            sd[f"{prefix}.{ln}.weight"] = np.asarray(blk[ln]["scale"])
            sd[f"{prefix}.{ln}.bias"] = np.asarray(blk[ln]["bias"])
        sd[f"{prefix}.mlp.c_fc.weight"] = np.asarray(blk["mlp"]["c_fc"]["kernel"]).T
        sd[f"{prefix}.mlp.c_fc.bias"] = np.asarray(blk["mlp"]["c_fc"]["bias"])
        sd[f"{prefix}.mlp.c_proj.weight"] = np.asarray(blk["mlp"]["c_proj"]["kernel"]).T
        sd[f"{prefix}.mlp.c_proj.bias"] = np.asarray(blk["mlp"]["c_proj"]["bias"])

    vis = p["visual"]
    sd["image_encoder.conv1.weight"] = np.asarray(vis["conv1"]["kernel"]).transpose(3, 2, 0, 1)
    sd["image_encoder.class_embedding"] = np.asarray(vis["class_embedding"])
    sd["image_encoder.positional_embedding"] = np.asarray(vis["positional_embedding"])
    for ln in ("ln_pre", "ln_post"):
        sd[f"image_encoder.{ln}.weight"] = np.asarray(vis[ln]["scale"])
        sd[f"image_encoder.{ln}.bias"] = np.asarray(vis[ln]["bias"])
    sd["image_encoder.proj"] = np.asarray(vis["proj"])
    i = 0
    while f"resblocks_{i}" in vis:
        put_block(f"image_encoder.transformer.resblocks.{i}", vis[f"resblocks_{i}"])
        i += 1

    for name in ("bottleneck", "bottleneck_proj"):
        sd[f"{name}.weight"] = np.asarray(p[name]["scale"])
        sd[f"{name}.bias"] = np.asarray(p[name]["bias"])
        sd[f"{name}.running_mean"] = np.asarray(bs[name]["mean"])
        sd[f"{name}.running_var"] = np.asarray(bs[name]["var"])
    for name in ("classifier", "classifier_proj"):
        sd[f"{name}.weight"] = np.asarray(p[name]["kernel"]).T

    if uniprompt:
        pl = p["prompt_learner"]
        sd["prompt_learner.ctx_generic"] = np.asarray(pl["ctx_generic"])
        sd["prompt_learner.ctx_modality"] = np.asarray(pl["ctx_modality"])
        sd["prompt_learner.ctx_platform"] = np.asarray(pl["ctx_platform"])
        sd["prompt_learner.visual_enhanced_net.linear1.weight"] = np.asarray(
            pl["ve_linear1"]["kernel"]).T
        sd["prompt_learner.visual_enhanced_net.linear1.bias"] = np.asarray(
            pl["ve_linear1"]["bias"])
        sd["prompt_learner.visual_enhanced_net.linear2.weight"] = np.asarray(
            pl["ve_linear2"]["kernel"]).T
        sd["prompt_learner.visual_enhanced_net.linear2.bias"] = np.asarray(
            pl["ve_linear2"]["bias"])
        sd["visual_prompt"] = np.asarray(p["visual_prompt"])
        sd["image_fusion_net.fc1.weight"] = np.asarray(p["fusion_fc1"]["kernel"]).T
        sd["image_fusion_net.fc1.bias"] = np.asarray(p["fusion_fc1"]["bias"])
        sd["image_fusion_net.fc2.weight"] = np.asarray(p["fusion_fc2"]["kernel"]).T
        sd["image_fusion_net.fc2.bias"] = np.asarray(p["fusion_fc2"]["bias"])
        txt = p["text"]
        sd["text_encoder.positional_embedding"] = np.asarray(txt["positional_embedding"])
        sd["text_encoder.ln_final.weight"] = np.asarray(txt["ln_final"]["scale"])
        sd["text_encoder.ln_final.bias"] = np.asarray(txt["ln_final"]["bias"])
        sd["text_encoder.text_projection"] = np.asarray(txt["text_projection"])
        i = 0
        while f"resblocks_{i}" in txt:
            put_block(f"text_encoder.transformer.resblocks.{i}",
                      txt[f"resblocks_{i}"], tower="text")
            i += 1
    return sd


def _assert_subtree_close(got, want, path=""):
    if isinstance(want, dict):
        for k in want:
            _assert_subtree_close(got[k], want[k], f"{path}/{k}")
    else:
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6,
                                   err_msg=path)


@pytest.mark.parametrize("uniprompt", [False, True])
def test_roundtrip(uniprompt):
    cfg = tiny_cfg()
    model, variables = tiny_model(cfg, num_classes=5, uniprompt=uniprompt)
    # randomize batch_stats so the BN roundtrip is meaningful
    import flax, jax.numpy as jnp

    variables = flax.core.unfreeze(variables)
    for name in ("bottleneck", "bottleneck_proj"):
        variables["batch_stats"][name]["mean"] = jax.random.normal(
            jax.random.PRNGKey(1), variables["batch_stats"][name]["mean"].shape)

    sd = torch_layout_from_variables(variables, uniprompt, model)
    # simulate DataParallel 'module.' prefixes (ref load_param strips them)
    sd = {f"module.{k}": v for k, v in sd.items()}
    overlay = convert_reid_state_dict(sd, model)
    merged = apply_overlay(
        {"params": {}, "batch_stats": {}}, overlay
    )
    for top, sub in merged["params"].items():
        if top == "prompt_learner":
            # template buffers are recomputed, only contexts + VE net mapped
            for k in sub:
                _assert_subtree_close(sub[k], variables["params"][top][k], f"{top}/{k}")
        elif top == "text":
            for k in sub:
                _assert_subtree_close(sub[k], variables["params"]["text"][k], f"text/{k}")
        else:
            _assert_subtree_close(sub, variables["params"][top], top)
    for name in ("bottleneck", "bottleneck_proj"):
        _assert_subtree_close(merged["batch_stats"][name]["mean"],
                              variables["batch_stats"][name]["mean"], name)


def test_overlay_preserves_unmapped(monkeypatch):
    cfg = tiny_cfg()
    model, variables = tiny_model(cfg, num_classes=5, uniprompt=True)
    sd = {"classifier.weight": np.zeros((5, 64), np.float32)}
    overlay = convert_reid_state_dict(sd, model)
    merged = apply_overlay(variables, overlay)
    assert np.all(np.asarray(merged["params"]["classifier"]["kernel"]) == 0)
    # untouched: token embedding stays as before
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["text"]["token_embedding"]["embedding"]),
        np.asarray(variables["params"]["text"]["token_embedding"]["embedding"]),
    )


class TestClipDownload:
    """SHA256-verified checkpoint fetch (ref model/clip/clip.py:39-68),
    exercised hermetically through file:// URLs."""

    def _make_source(self, tmp_path, data=b"clip-weights-bytes"):
        import hashlib

        sha = hashlib.sha256(data).hexdigest()
        src_dir = tmp_path / "cdn" / sha
        src_dir.mkdir(parents=True)
        src = src_dir / "Model.pt"
        src.write_bytes(data)
        return f"file://{src}", data

    def test_download_verifies_and_caches(self, tmp_path):
        from mpreid_tpu.models.download import download

        url, data = self._make_source(tmp_path)
        root = str(tmp_path / "cache")
        out = download(url, root=root)
        assert open(out, "rb").read() == data
        # second call reuses the cache (delete the source to prove it)
        import os
        os.remove(url[len("file://"):])
        assert download(url, root=root) == out

    def test_download_rejects_bad_digest(self, tmp_path):
        import os

        from mpreid_tpu.models.download import download

        url, _ = self._make_source(tmp_path)
        # corrupt the expected digest by pointing at a renamed dir
        bad_dir = tmp_path / "cdn" / ("0" * 64)
        os.rename(os.path.dirname(url[len("file://"):]), bad_dir)
        bad_url = f"file://{bad_dir}/Model.pt"
        root = str(tmp_path / "cache")
        with pytest.raises(RuntimeError, match="SHA256"):
            download(bad_url, root=root)
        assert not os.path.exists(os.path.join(root, "Model.pt"))
        assert not os.path.exists(os.path.join(root, "Model.pt.partial"))

    def test_redownloads_corrupted_cache(self, tmp_path):
        from mpreid_tpu.models.download import download

        url, data = self._make_source(tmp_path)
        root = str(tmp_path / "cache")
        out = download(url, root=root)
        open(out, "wb").write(b"corrupted")
        assert open(download(url, root=root), "rb").read() == data

    def test_unknown_model_name(self):
        from mpreid_tpu.models.download import download_clip

        with pytest.raises(ValueError, match="ViT-B-16"):
            download_clip("ViT-H-99")

    def test_unreachable_url_message_mentions_pretrain_path(self, tmp_path):
        from mpreid_tpu.models.download import download

        sha = "a" * 64
        with pytest.raises(RuntimeError, match="MODEL.PRETRAIN_PATH"):
            download(f"file://{tmp_path}/{sha}/missing.pt", root=str(tmp_path / "c"))


def test_export_folds_lora_into_in_proj():
    """A LoRA-trained model must export its EFFECTIVE attention weights:
    W + (alpha/r)*A@B folded into in_proj_weight (the reference has no LoRA
    keys to receive the adapters separately)."""
    import numpy as np

    from mpreid_tpu.models.convert import _export_block

    rng = np.random.RandomState(0)
    d, r, alpha = 8, 2, 16.0
    kernel = rng.randn(d, 3 * d).astype(np.float32)
    a = rng.randn(d, r).astype(np.float32)
    bmat = rng.randn(r, 3 * d).astype(np.float32)
    sub = {
        "attn": {
            "in_proj_kernel": kernel,
            "in_proj_bias": np.zeros(3 * d, np.float32),
            "out_proj_kernel": np.eye(d, dtype=np.float32),
            "out_proj_bias": np.zeros(d, np.float32),
            "lora_a": a,
            "lora_b": bmat,
        },
        "ln_1": {"scale": np.ones(d, np.float32), "bias": np.zeros(d, np.float32)},
        "ln_2": {"scale": np.ones(d, np.float32), "bias": np.zeros(d, np.float32)},
    }
    out = {}
    _export_block(sub, "blk", out, lora_alpha=alpha)
    want = (kernel + (alpha / r) * (a @ bmat)).T
    np.testing.assert_allclose(
        out["blk.attn.in_proj_weight"].numpy(), want, rtol=1e-6, atol=1e-6
    )
