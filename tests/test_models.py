import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpreid_tpu.config import get_default_cfg
from mpreid_tpu.models import (
    init_variables,
    make_model,
    make_model_uniprompt,
)
from mpreid_tpu.models.uniprompt import UniPromptReID


def tiny_cfg(name="ViT-B-16"):
    cfg = get_default_cfg()
    cfg.MODEL.NAME = name
    cfg.INPUT.SIZE_TRAIN = [64, 32]
    cfg.INPUT.SIZE_TEST = [64, 32]
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


@pytest.fixture(scope="module")
def vit_model_and_vars():
    cfg = tiny_cfg()
    m = make_model(cfg, num_class=10, camera_num=4, view_num=2)
    v = init_variables(m, jax.random.PRNGKey(0), cfg)
    return cfg, m, v


def test_vit_train_shapes(vit_model_and_vars):
    cfg, m, v = vit_model_and_vars
    x = jnp.ones((4, 64, 32, 3))
    out, _ = m.apply(v, x, jnp.arange(4), train=True, mutable=["batch_stats"])
    assert out["scores"][0].shape == (4, 10)
    assert out["scores"][1].shape == (4, 10)
    # [feat_last, feat, feat_proj] dims: 768/768/512 for ViT-B/16
    assert [f.shape[-1] for f in out["feats"]] == [768, 768, 512]


def test_vit_eval_concat_feature(vit_model_and_vars):
    cfg, m, v = vit_model_and_vars
    x = jnp.ones((2, 64, 32, 3))
    feat = m.apply(v, x, train=False)
    assert feat.shape == (2, 768 + 512)


def test_neck_feat_before_differs(vit_model_and_vars):
    cfg, m, v = vit_model_and_vars
    import dataclasses

    m_before = dataclasses.replace(m, neck_feat="before")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 32, 3))
    # At init BN is identity (mean 0 / var 1); perturb stats so the modes differ.
    import flax

    v = flax.core.unfreeze(v)
    v["batch_stats"]["bottleneck"]["mean"] = (
        jnp.ones_like(v["batch_stats"]["bottleneck"]["mean"]) * 0.5
    )
    f_after = m.apply(v, x, train=False)
    f_before = m_before.apply(v, x, train=False)
    assert not np.allclose(np.asarray(f_after), np.asarray(f_before))


def test_bnneck_bias_zero(vit_model_and_vars):
    _, _, v = vit_model_and_vars
    assert np.all(np.asarray(v["params"]["bottleneck"]["bias"]) == 0)


def test_sie_embedding_changes_output(vit_model_and_vars):
    cfg, _, _ = vit_model_and_vars
    import dataclasses

    cfg2 = tiny_cfg()
    cfg2.MODEL.SIE_CAMERA = True
    m = make_model(cfg2, num_class=10, camera_num=4, view_num=2)
    v = init_variables(m, jax.random.PRNGKey(0), cfg2)
    # make cv_embed non-zero to see the effect
    v = jax.tree_util.tree_map(lambda a: a, v)
    import flax

    v = flax.core.unfreeze(v)
    v["params"]["cv_embed"] = (
        jax.random.normal(jax.random.PRNGKey(2), v["params"]["cv_embed"].shape) * 0.1
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 32, 3))
    f0 = m.apply(v, x, cam_label=jnp.array([0, 0]), train=False)
    f1 = m.apply(v, x, cam_label=jnp.array([1, 2]), train=False)
    assert not np.allclose(np.asarray(f0), np.asarray(f1), atol=1e-5)


def test_rn50_shapes():
    cfg = tiny_cfg("RN50")
    m = make_model(cfg, num_class=5, camera_num=2, view_num=1)
    v = init_variables(m, jax.random.PRNGKey(0), cfg)
    x = jnp.ones((2, 64, 32, 3))
    out, _ = m.apply(v, x, jnp.arange(2), train=True, mutable=["batch_stats"])
    assert [f.shape[-1] for f in out["feats"]] == [1024, 2048, 1024]
    feat = m.apply(v, x, train=False)
    assert feat.shape == (2, 2048 + 1024)


class TestUniPrompt:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = tiny_cfg()
        m = make_model_uniprompt(cfg, num_class=10, camera_num=14, view_num=1)
        v = init_variables(m, jax.random.PRNGKey(0), cfg)
        return cfg, m, v

    def test_get_text_stages(self, setup):
        cfg, m, v = setup
        lbl = jnp.array([0, 5])
        view = jnp.array([3, 13])
        t1a = m.apply(v, lbl, None, "1a", method=UniPromptReID.get_text)
        t1b = m.apply(v, lbl, view, "1b", method=UniPromptReID.get_text)
        t1b_noview = m.apply(v, lbl, None, "1b", method=UniPromptReID.get_text)
        assert t1a.shape == (2, 512)
        # domain context changes features between stages
        assert not np.allclose(np.asarray(t1a), np.asarray(t1b))
        assert not np.allclose(np.asarray(t1b), np.asarray(t1b_noview))

    def test_view_mapping(self):
        from mpreid_tpu.models.uniprompt import view_to_platform_modality

        views = jnp.array([0, 5, 6, 11, 12, 13])
        plat, modal = view_to_platform_modality(views)
        assert plat.tolist() == [0, 0, 0, 0, 1, 1]
        assert modal.tolist() == [0, 0, 1, 1, 0, 1]

    def test_train_forward(self, setup):
        cfg, m, v = setup
        x = jnp.ones((4, 64, 32, 3))
        out, _ = m.apply(v, x, jnp.arange(4), train=True, mutable=["batch_stats"])
        assert out["img_feature_proj"].shape == (4, 512)
        assert out["image_features_proj_raw"].ndim == 3

    def test_visual_prompt_shifts_feature(self, setup):
        cfg, m, v = setup
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 32, 3))
        a = m.apply(v, x, method=UniPromptReID.get_image)
        b = m.apply(v, x, method=UniPromptReID.get_image_vp)
        vp = np.asarray(v["params"]["visual_prompt"])[0, 0]
        np.testing.assert_allclose(np.asarray(b - a), np.tile(vp, (2, 1)), rtol=2e-4, atol=2e-5)


def test_abstract_init_matches_real_structure():
    import dataclasses
    from mpreid_tpu.models import init_variables
    from mpreid_tpu.models.reid import ReIDModel

    cfg = tiny_cfg()
    cfg.INPUT.SIZE_TRAIN = [32, 16]  # matches tiny_clip_config's 2x1 grid
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from tiny import tiny_clip_config

    m = ReIDModel(clip_config=tiny_clip_config(), num_classes=4)
    real = init_variables(m, jax.random.PRNGKey(0), cfg)
    fake = init_variables(m, jax.random.PRNGKey(0), cfg, abstract=True)
    rl = jax.tree_util.tree_structure(real)
    fl = jax.tree_util.tree_structure(fake)
    assert rl == fl
    for a, b in zip(jax.tree_util.tree_leaves(real), jax.tree_util.tree_leaves(fake)):
        assert a.shape == b.shape and a.dtype == b.dtype
    # batch-norm running var starts at ones in both
    np.testing.assert_array_equal(
        np.asarray(fake["batch_stats"]["bottleneck"]["var"]),
        np.asarray(real["batch_stats"]["bottleneck"]["var"]),
    )


def test_bf16_policy_feature_drift_is_small():
    """bf16 compute must stay directionally faithful to fp32 (the parity
    policy: bf16 activations, fp32 LayerNorm/softmax/accumulation)."""
    import dataclasses
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from tiny import tiny_clip_config
    from mpreid_tpu.models.reid import ReIDModel

    cc = tiny_clip_config(vision_layers=4, transformer_layers=2)
    m32 = ReIDModel(clip_config=cc, num_classes=4, dtype=jnp.float32)
    m16 = ReIDModel(clip_config=cc, num_classes=4, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, 32, 16, 3))
    v = m32.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32), train=True)

    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 16, 3))
    f32 = np.asarray(m32.apply(v, x, train=False))
    f16 = np.asarray(m16.apply(v, x, train=False)).astype(np.float32)
    cos = np.sum(f32 * f16, axis=1) / (
        np.linalg.norm(f32, axis=1) * np.linalg.norm(f16, axis=1)
    )
    assert cos.min() > 0.995, cos
