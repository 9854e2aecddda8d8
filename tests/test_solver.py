import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpreid_tpu.config import get_default_cfg
from mpreid_tpu.solver import (
    Optimizer,
    group_trees,
    make_optimizer,
    make_scheduler,
    stage_trainable,
    warmup_cosine,
    warmup_multistep,
)


class TestSchedules:
    def test_multistep_reference_math(self):
        # WarmupMultiStepLR semantics (lr_scheduler.py:43-56)
        s = warmup_multistep(0.1, [40, 70], gamma=0.1, warmup_factor=0.01,
                             warmup_iters=10, warmup_method="linear")
        # during warmup: base * (wf*(1-a) + a)
        assert np.isclose(s(0), 0.1 * 0.01)
        a = 5 / 10
        assert np.isclose(s(5), 0.1 * (0.01 * (1 - a) + a))
        assert np.isclose(s(10), 0.1)
        assert np.isclose(s(39), 0.1)
        assert np.isclose(s(40), 0.01)
        assert np.isclose(s(70), 0.001)

    def test_multistep_constant_warmup(self):
        s = warmup_multistep(1.0, [100], warmup_factor=0.5, warmup_iters=4,
                             warmup_method="constant")
        assert s(2) == 0.5
        assert s(4) == 1.0

    def test_cosine_timm_math(self):
        # CosineLRScheduler (cosine_lr.py:67-94) pinned per scheduler_factory
        base, t_init, lr_min, wu_t, wu_init = 3.5e-4, 60, 1e-6, 5, 1e-5
        s = warmup_cosine(base, t_init, lr_min, wu_t, wu_init)
        # warmup: linear from wu_init
        step = (base - wu_init) / wu_t
        assert np.isclose(s(0), wu_init)
        assert np.isclose(s(3), wu_init + 3 * step)
        # cosine phase (t counts warmup inside t_initial, warmup_prefix=False)
        t = 30
        expected = lr_min + 0.5 * (base - lr_min) * (1 + math.cos(math.pi * t / t_init))
        assert np.isclose(s(t), expected)
        # past cycle_limit=1 → pinned at lr_min
        assert np.isclose(s(61), lr_min)

    def test_make_scheduler(self):
        cfg = get_default_cfg()
        s = make_scheduler(cfg.SOLVER.STAGE2, "multistep")
        assert s(0) > 0
        c = make_scheduler(cfg.SOLVER.STAGE1, "cosine")
        assert c(0) == cfg.SOLVER.STAGE1.WARMUP_LR_INIT


def params_tree():
    return {
        "visual": {
            "resblocks_0": {
                "attn": {"in_proj_kernel": jnp.ones((4, 12)), "in_proj_bias": jnp.zeros(12)},
                "experts": {"c_fc_kernel": jnp.ones((2, 4, 16))},
                "gate_kernel": jnp.ones((4, 2)),
            },
        },
        "text": {"resblocks_0": {"ln_1": {"scale": jnp.ones(4), "bias": jnp.zeros(4)}}},
        "prompt_learner": {
            "ctx_generic": jnp.zeros((8, 8, 4)),
            "ctx_modality": jnp.zeros((2, 4, 4)),
            "ctx_platform": jnp.zeros((2, 4, 4)),
        },
        "bottleneck": {"scale": jnp.ones(4), "bias": jnp.zeros(4)},
        "classifier": {"kernel": jnp.ones((4, 8))},
    }


class TestStageMasks:
    def test_stage1a(self):
        m = stage_trainable(params_tree(), "stage1a")
        assert m["prompt_learner"]["ctx_generic"] is True
        assert m["prompt_learner"]["ctx_modality"] is False
        assert m["visual"]["resblocks_0"]["gate_kernel"] is False

    def test_stage1b(self):
        m = stage_trainable(params_tree(), "stage1b")
        assert m["prompt_learner"]["ctx_generic"] is False
        assert m["prompt_learner"]["ctx_modality"] is True
        assert m["prompt_learner"]["ctx_platform"] is True

    def test_stage2a_freezes_text_experts_prompts(self):
        m = stage_trainable(params_tree(), "stage2a")
        assert m["text"]["resblocks_0"]["ln_1"]["scale"] is False
        assert m["visual"]["resblocks_0"]["experts"]["c_fc_kernel"] is False
        assert m["prompt_learner"]["ctx_generic"] is False
        assert m["visual"]["resblocks_0"]["attn"]["in_proj_kernel"] is True
        assert m["classifier"]["kernel"] is True
        assert m["bottleneck"]["bias"] is False  # BNNeck bias always frozen

    def test_stage2b_only_gate_and_encoder(self):
        m = stage_trainable(params_tree(), "stage2b")
        assert m["visual"]["resblocks_0"]["gate_kernel"] is True
        assert m["visual"]["resblocks_0"]["attn"]["in_proj_kernel"] is True
        assert m["visual"]["resblocks_0"]["experts"]["c_fc_kernel"] is False
        assert m["classifier"]["kernel"] is False
        assert m["text"]["resblocks_0"]["ln_1"]["scale"] is False

    def test_baseline_trains_all_but_bn_bias(self):
        m = stage_trainable(params_tree(), "baseline")
        assert m["bottleneck"]["bias"] is False
        assert m["bottleneck"]["scale"] is True


class TestGroupTrees:
    def test_bias_groups(self):
        cfg = get_default_cfg()
        cfg.SOLVER.STAGE2.BIAS_LR_FACTOR = 2
        cfg.SOLVER.STAGE2.WEIGHT_DECAY = 1e-4
        cfg.SOLVER.STAGE2.WEIGHT_DECAY_BIAS = 1e-5
        lr_mult, wd = group_trees(params_tree(), cfg.SOLVER.STAGE2)
        assert lr_mult["visual"]["resblocks_0"]["attn"]["in_proj_bias"] == 2.0
        assert lr_mult["visual"]["resblocks_0"]["attn"]["in_proj_kernel"] == 1.0
        assert wd["bottleneck"]["bias"] == 1e-5
        assert wd["classifier"]["kernel"] == 1e-4

    def test_large_fc(self):
        cfg = get_default_cfg()
        cfg.SOLVER.STAGE2.LARGE_FC_LR = True
        lr_mult, _ = group_trees(params_tree(), cfg.SOLVER.STAGE2)
        assert lr_mult["classifier"]["kernel"] == 2.0


class TestOptimizerMath:
    def quad_params(self):
        return {"w": jnp.array([1.0, -2.0, 3.0]), "bias": jnp.array([0.5])}

    def run_step(self, opt, params, grads_full, lr):
        train, frozen = opt.partition(params)
        state = opt.init(params)
        g = {k: grads_full[k[-1]] for k in train}
        new_train, new_state = opt.update(g, state, train, lr)
        return opt.merge(new_train, frozen), new_state, train

    def test_sgd_matches_torch_formula(self):
        cfg = get_default_cfg()
        cfg.SOLVER.WEIGHT_DECAY = 0.0
        cfg.SOLVER.WEIGHT_DECAY_BIAS = 0.0
        params = self.quad_params()
        opt = Optimizer("SGD", params, cfg.SOLVER, stage="baseline")
        g = {"w": jnp.ones(3), "bias": jnp.ones(1)}
        p1, s1, train = self.run_step(opt, params, g, 0.1)
        np.testing.assert_allclose(np.asarray(p1["w"]), np.asarray(params["w"]) - 0.1)
        # second step accumulates momentum: buf = 0.9*1 + 1 = 1.9
        t1, f1 = opt.partition(p1)
        g_sub = {k: g[k[-1]] for k in t1}
        t2, _ = opt.update(g_sub, s1, t1, 0.1)
        p2 = opt.merge(t2, f1)
        np.testing.assert_allclose(np.asarray(p2["w"]), np.asarray(p1["w"]) - 0.1 * 1.9,
                                   rtol=1e-6)

    def test_adam_first_step_is_lr_sized(self):
        cfg = get_default_cfg()
        cfg.SOLVER.WEIGHT_DECAY = 0.0
        cfg.SOLVER.WEIGHT_DECAY_BIAS = 0.0
        params = self.quad_params()
        opt = Optimizer("Adam", params, cfg.SOLVER, stage="baseline")
        g = {"w": jnp.array([0.5, -1.0, 2.0]), "bias": jnp.array([1.0])}
        p1, _, _ = self.run_step(opt, params, g, 1e-3)
        # torch Adam first step ≈ lr * sign(g)
        np.testing.assert_allclose(
            np.asarray(params["w"] - p1["w"]), 1e-3 * np.sign(np.asarray(g["w"])),
            rtol=1e-4,
        )

    def test_coupled_weight_decay(self):
        cfg = get_default_cfg()
        cfg.SOLVER.WEIGHT_DECAY = 0.1
        cfg.SOLVER.WEIGHT_DECAY_BIAS = 0.0
        cfg.SOLVER.MOMENTUM = 0.0
        params = self.quad_params()
        opt = Optimizer("SGD", params, cfg.SOLVER, stage="baseline")
        g = {"w": jnp.zeros(3), "bias": jnp.zeros(1)}
        p1, _, _ = self.run_step(opt, params, g, 1.0)
        # zero grads + coupled L2 → p shrinks by lr*wd*p
        np.testing.assert_allclose(
            np.asarray(p1["w"]), np.asarray(params["w"]) * (1 - 0.1), rtol=1e-6
        )
        np.testing.assert_allclose(np.asarray(p1["bias"]), np.asarray(params["bias"]))

    def test_bf16_moments_track_fp32_trajectory(self):
        # MOMENT_DTYPE bfloat16: moments STORED rounded, math still fp32.
        # Over a multi-step quadratic descent the trajectory must stay within
        # bf16 rounding (~0.4% relative) of the fp32 optimizer's.
        cfg32 = get_default_cfg()
        cfg16 = get_default_cfg()
        cfg16.SOLVER.MOMENT_DTYPE = "bfloat16"
        for c in (cfg32, cfg16):
            c.SOLVER.WEIGHT_DECAY = 0.0
            c.SOLVER.WEIGHT_DECAY_BIAS = 0.0

        params = self.quad_params()
        target = {"w": jnp.array([0.0, 1.0, -1.0]), "bias": jnp.array([0.0])}

        def run(cfg):
            opt = Optimizer("Adam", params, cfg.SOLVER, stage="baseline")
            train, frozen = opt.partition(params)
            state = opt.init(params)
            tgt, _ = opt.partition(target)
            for _ in range(25):
                g = {k: 2.0 * (train[k] - tgt[k]) for k in train}
                train, state = opt.update(g, state, train, 1e-2)
            return opt, train, state

        opt16, t16, s16 = run(cfg16)
        _, t32, _ = run(cfg32)
        assert all(v.dtype == jnp.bfloat16 for v in s16.mu.values())
        assert all(v.dtype == jnp.bfloat16 for v in s16.nu.values())
        for k in t32:
            np.testing.assert_allclose(
                np.asarray(t32[k]), np.asarray(t16[k]), rtol=0, atol=5e-3
            )
        # fp32 default stays exactly fp32 (torch-parity path untouched)
        opt32 = Optimizer("Adam", params, cfg32.SOLVER, stage="baseline")
        st = opt32.init(params)
        assert all(v.dtype == jnp.float32 for v in st.mu.values())

    def test_partition_excludes_frozen(self):
        cfg = get_default_cfg()
        params = {"prompt_learner": {"ctx_generic": jnp.ones(4), "ctx_modality": jnp.ones(4)}}
        opt = Optimizer("Adam", params, cfg.SOLVER.STAGE1A, stage="stage1a")
        train, frozen = opt.partition(params)
        assert list(train) == [("prompt_learner", "ctx_generic")]
        assert list(frozen) == [("prompt_learner", "ctx_modality")]
        # optimizer state holds moments only for the trainable leaf
        state = opt.init(params)
        assert list(state.mu) == [("prompt_learner", "ctx_generic")]
        g = {("prompt_learner", "ctx_generic"): jnp.ones(4)}
        new_train, _ = opt.update(g, state, train, 0.1)
        merged = opt.merge(new_train, frozen)
        assert not np.allclose(merged["prompt_learner"]["ctx_generic"], 1.0)
        np.testing.assert_allclose(np.asarray(merged["prompt_learner"]["ctx_modality"]), 1.0)


def test_lr_noise_wrapper():
    from mpreid_tpu.solver import with_lr_noise

    base = lambda t: 0.1
    noisy = with_lr_noise(base, noise_range_t=(5, 10), noise_pct=0.67,
                          noise_std=1.0, noise_seed=42)
    # outside the range: untouched
    assert noisy(0) == 0.1 and noisy(10) == 0.1
    # inside: perturbed but bounded by pct, deterministic per epoch
    vals = [noisy(t) for t in range(5, 10)]
    assert all(abs(v - 0.1) < 0.1 * 0.67 + 1e-9 for v in vals)
    assert any(v != 0.1 for v in vals)
    assert noisy(6) == noisy(6)
    # None range = passthrough
    assert with_lr_noise(base, None)(7) == 0.1
