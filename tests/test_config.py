import os
import tempfile

import pytest

from mpreid_tpu.config import get_default_cfg


def test_defaults_match_reference_values():
    cfg = get_default_cfg()
    assert cfg.MODEL.SIE_COE == 3.0
    assert cfg.SOLVER.STAGE1.IMS_PER_BATCH == 64
    assert cfg.SOLVER.STEPS == (40, 70)
    assert cfg.TEST.NECK_FEAT == "after"
    assert cfg.INPUT.PIXEL_MEAN == [0.485, 0.456, 0.406]


def test_merge_from_list():
    cfg = get_default_cfg()
    cfg.merge_from_list(["MODEL.NAME", "ViT-B-16", "SOLVER.BASE_LR", "0.001",
                         "MODEL.SIE_CAMERA", "True"])
    assert cfg.MODEL.NAME == "ViT-B-16"
    assert cfg.SOLVER.BASE_LR == 0.001
    assert cfg.MODEL.SIE_CAMERA is True


def test_merge_from_yaml_overlay():
    yaml_text = """
MODEL:
  NAME: 'ViT-B-16'
  STRIDE_SIZE: [16, 16]
  ID_LOSS_WEIGHT: 0.25
INPUT:
  SIZE_TRAIN: [256, 128]
  PIXEL_MEAN: [0.5, 0.5, 0.5]
DATALOADER:
  SAMPLER: 'softmax_triplet'
  NUM_INSTANCE: 4
"""
    cfg = get_default_cfg()
    with tempfile.NamedTemporaryFile("w", suffix=".yml", delete=False) as f:
        f.write(yaml_text)
        path = f.name
    try:
        cfg.merge_from_file(path)
    finally:
        os.unlink(path)
    assert cfg.MODEL.ID_LOSS_WEIGHT == 0.25
    assert cfg.INPUT.SIZE_TRAIN == [256, 128]
    assert cfg.DATALOADER.NUM_INSTANCE == 4


def test_freeze_blocks_mutation():
    cfg = get_default_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.MODEL.NAME = "x"
    cfg.defrost()
    cfg.MODEL.NAME = "RN50"
    assert cfg.MODEL.NAME == "RN50"


def test_unknown_key_rejected():
    cfg = get_default_cfg()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["MODEL.NOT_A_KEY", "1"])


def test_compile_cache_dir(tmp_path):
    """TPU.COMPILE_CACHE_DIR wires the persistent XLA compilation cache
    (utils/platform.py::apply_compile_cache): compiled programs land in the
    directory and are loadable on recompile."""
    import jax
    import jax.numpy as jnp

    from mpreid_tpu.utils.platform import apply_compile_cache

    cfg = get_default_cfg()
    cfg.TPU.COMPILE_CACHE_DIR = str(tmp_path / "xla_cache")
    apply_compile_cache(cfg)
    try:
        # the 1 s compile-time floor skips toy programs; drop it for the test
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        f = jax.jit(lambda x: jnp.tanh(x) @ x.T + 3.25)
        _ = f(jnp.ones((32, 32))).block_until_ready()
        entries = list((tmp_path / "xla_cache").iterdir())
        assert entries, "no compilation cache entries written"
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
