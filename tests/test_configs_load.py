"""Every shipped YAML config must merge cleanly into the default tree."""

import glob
import os

import pytest

from mpreid_tpu.config import get_default_cfg

CONFIGS = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "configs", "**", "*.yml"), recursive=True))


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.relpath(p) for p in CONFIGS])
def test_config_merges(path):
    cfg = get_default_cfg()
    cfg.merge_from_file(path)
    cfg.freeze()
    assert cfg.MODEL.NAME in ("ViT-B-16", "RN50")


def test_reference_yaml_compat():
    """The reference repo's own YAML overlays must merge too."""
    ref = "/root/reference/configs"
    if not os.path.isdir(ref):
        pytest.skip("reference not available")
    for path in sorted(glob.glob(os.path.join(ref, "**", "*.yml"), recursive=True)):
        cfg = get_default_cfg()
        cfg.merge_from_file(path)
        cfg.freeze()
