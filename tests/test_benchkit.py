"""Smoke tests for the shared bench harness (utils/benchkit.py).

bench.py, the tools/ A/B scripts and the profiler all time benchkit's
programs; these tests drive every builder end-to-end (tiny towers, tiny
images, CPU) so a drift or breakage in the shared harness is caught before
a TPU bench run discovers it.
"""

import numpy as np
import pytest

from mpreid_tpu.utils import benchkit


@pytest.fixture(scope="module")
def tiny_env():
    return benchkit.uniprompt_env(
        num_classes=12, camera_num=4, view_num=1, size=(64, 32),
        debug_tiny=True,
    )


def test_stage1_harness_and_window(tiny_env):
    cfg, model, variables = tiny_env
    h = benchkit.stage1_harness(
        cfg, model, variables, stage="1a", iters=3, batch=8,
        num_classes=12, embed_dim=model.clip_config.embed_dim,
    )
    run = benchkit.epoch_window(h)
    dt = benchkit.best_of(run, windows=2, warmup=1)
    assert dt > 0
    assert h["state"].opt_state.step.item() == 3 * 3  # 3 windows × 3 iters


def test_stage1b_random_views(tiny_env):
    cfg, model, variables = tiny_env
    h = benchkit.stage1_harness(
        cfg, model, variables, stage="1b", iters=2, batch=4,
        num_classes=12, embed_dim=model.clip_config.embed_dim,
        random_views=True,
    )
    assert int(np.asarray(h["views"]).max()) > 0  # real view labels
    assert benchkit.best_of(benchkit.epoch_window(h), windows=1) > 0


def test_stage2_harness_and_step_window(tiny_env):
    cfg, model, variables = tiny_env
    h = benchkit.stage2_harness(
        cfg, model, variables, num_classes=12, batch=8,
        embed_dim=model.clip_config.embed_dim,
    )
    assert h["batch"]["images"].shape == (8, 64, 32, 3)
    dt = benchkit.best_of(benchkit.step_window(h, iters=2), windows=2)
    assert dt > 0
    assert h["state"].opt_state.step.item() == 3 * 2


def test_eval_scan(tiny_env):
    cfg, model, variables = tiny_env
    run = benchkit.make_eval_scan(
        cfg, model, variables["params"], variables.get("batch_stats", {}),
        batch=4, iters=3,
    )
    v = run()
    assert np.isfinite(v)
    assert benchkit.best_of(benchkit.timed(run), windows=1) > 0


def test_rn50_env_baseline_harness():
    cfg, model, variables = benchkit.rn50_env(
        num_classes=12, size=(64, 32), debug_tiny=True
    )
    h = benchkit.baseline_harness(cfg, model, variables, num_classes=12,
                                  batch=8)
    assert benchkit.best_of(benchkit.step_window(h, iters=1), windows=1) > 0
    run = benchkit.make_eval_scan(
        cfg, model, variables["params"], variables.get("batch_stats", {}),
        batch=4, iters=2,
    )
    assert np.isfinite(run())
