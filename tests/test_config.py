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
