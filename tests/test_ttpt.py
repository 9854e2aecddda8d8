"""TTA / TTPT eval mode tests (engine/ttpt.py)."""

import numpy as np
import pytest

from mpreid_tpu.data import make_dataloader
from mpreid_tpu.data.synthetic import make_mmmp
from mpreid_tpu.engine.ttpt import do_inference_tta, do_inference_ttpt

from tiny import tiny_cfg, tiny_model


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("mmmp_ttpt")
    make_mmmp(str(root), n_train_ids=4, n_test_ids=3, imgs_per_cam=2)
    cfg = tiny_cfg()
    cfg.DATASETS.NAMES = "mmmp"
    cfg.DATASETS.ROOT_DIR = str(root)
    cfg.DATASETS.EXP_SETTING = "exp_cctv_ir_cctv_rgb"
    loaders = make_dataloader(cfg)
    model, variables = tiny_model(cfg, num_classes=loaders[4], uniprompt=True)
    return cfg, model, variables, loaders


def test_tta_option_a(env):
    cfg, model, variables, (tl2, tl1, val, num_query, *_r) = env
    cfg.TEST.TTA_ENABLED = True
    r1, r5 = do_inference_tta(cfg, model, variables, val, num_query)
    assert 0.0 <= r1 <= 1.0 and 0.0 <= r5 <= 1.0


def test_ttpt_clip_style(env):
    cfg, model, variables, (tl2, tl1, val, num_query, *_r) = env
    cfg.TEST.TTA_ENABLED = True
    cfg.TEST.TTPT.ENABLED = True
    cfg.TEST.TTPT.STEPS = 2
    r1, r5 = do_inference_ttpt(cfg, model, variables, val, num_query)
    assert 0.0 <= r1 <= 1.0
    # the tuned prompt context must be restored implicitly — variables stay
    # untouched (pure-functional tuning, unlike the reference's in-place
    # mutation + manual restore)
    assert np.isfinite(
        np.asarray(variables["params"]["prompt_learner"]["ctx_generic"])
    ).all()


def test_ttpt_falls_back_to_tta_when_disabled(env):
    cfg, model, variables, (tl2, tl1, val, num_query, *_r) = env
    cfg.TEST.TTPT.ENABLED = False
    cfg.TEST.TTA_ENABLED = True
    r1, r5 = do_inference_ttpt(cfg, model, variables, val, num_query)
    assert 0.0 <= r1 <= 1.0
