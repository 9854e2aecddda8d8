import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpreid_tpu.data import make_dataloader
from mpreid_tpu.data.synthetic import make_market1501, make_mmmp
from mpreid_tpu.engine import (
    R1mAPEvaluator,
    build_image_bank,
    do_inference,
    do_train,
    do_train_stage1,
    do_train_stage2,
    precompute_text_features,
)
from mpreid_tpu.losses import make_loss
from mpreid_tpu.solver import make_optimizer, make_scheduler

from tiny import tiny_cfg, tiny_model

logging.getLogger("mpreid_tpu.train").setLevel(logging.ERROR)


@pytest.fixture(scope="module")
def market_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("m1501")
    make_market1501(str(root), n_ids=6, imgs_per_id=8)
    cfg = tiny_cfg()
    cfg.DATASETS.NAMES = "market1501"
    cfg.DATASETS.ROOT_DIR = str(root)
    loaders = make_dataloader(cfg)
    return cfg, loaders


class TestBaselineTrain:
    def test_loss_decreases_and_eval_runs(self, market_env):
        cfg, (tl2, tl1, val, num_query, num_classes, cams, views) = market_env
        model, variables = tiny_model(cfg, num_classes=num_classes)
        loss_fn, _ = make_loss(cfg, num_classes)
        cfg.SOLVER.BASE_LR = 3e-3
        opt = make_optimizer(cfg.SOLVER, variables["params"], stage="baseline")
        sched = lambda e: cfg.SOLVER.BASE_LR

        state, history = do_train(
            cfg, model, variables, tl2, None, opt, sched, loss_fn,
            num_query, max_epochs=4,
        )
        assert history[-1]["loss"] < history[0]["loss"]

        new_vars = {"params": state.params, "batch_stats": state.batch_stats}
        r1, r5 = do_inference(cfg, model, new_vars, val, num_query)
        assert 0.0 <= r1 <= 1.0

    def test_cos_layer_margin_head_trains(self, market_env):
        """MODEL.COS_LAYER wired end-to-end: factory builds MarginHead
        classifiers (ref stores the flag at make_model.py:34 but never uses
        it), training runs and the loss decreases."""
        cfg, (tl2, tl1, val, num_query, num_classes, cams, views) = market_env
        cfg2 = tiny_cfg()
        cfg2.DATASETS.NAMES = cfg.DATASETS.NAMES
        cfg2.MODEL.DEBUG_TINY = True
        cfg2.MODEL.COS_LAYER = True
        cfg2.MODEL.COS_LAYER_TYPE = "arcface"
        from mpreid_tpu.models import make_model, init_variables

        model = make_model(cfg2, num_classes, cams, views)
        variables = init_variables(model, jax.random.PRNGKey(0), cfg2)
        # margin heads hold a bare (C, feat) weight, not a Dense kernel
        assert "weight" in variables["params"]["classifier"]
        assert "weight" in variables["params"]["classifier_proj"]

        loss_fn, _ = make_loss(cfg2, num_classes)
        cfg2.SOLVER.BASE_LR = 3e-3
        opt = make_optimizer(cfg2.SOLVER, variables["params"], stage="baseline")
        state, history = do_train(
            cfg2, model, variables, tl2, None, opt,
            lambda e: cfg2.SOLVER.BASE_LR, loss_fn, num_query, max_epochs=4,
        )
        assert np.isfinite(history[-1]["loss"])
        assert history[-1]["loss"] < history[0]["loss"]

        new_vars = {"params": state.params, "batch_stats": state.batch_stats}
        r1, _ = do_inference(cfg2, model, new_vars, val, num_query)
        assert 0.0 <= r1 <= 1.0

    def test_bf16_moments_train(self, market_env):
        """SOLVER.MOMENT_DTYPE bfloat16 works through the full jitted
        donated train step: loss still decreases, moments stored bf16."""
        cfg, (tl2, tl1, val, num_query, num_classes, cams, views) = market_env
        cfg2 = tiny_cfg()
        cfg2.DATASETS.NAMES = cfg.DATASETS.NAMES
        cfg2.SOLVER.MOMENT_DTYPE = "bfloat16"
        cfg2.SOLVER.BASE_LR = 3e-3
        model, variables = tiny_model(cfg2, num_classes=num_classes)
        loss_fn, _ = make_loss(cfg2, num_classes)
        opt = make_optimizer(cfg2.SOLVER, variables["params"], stage="baseline")
        state, history = do_train(
            cfg2, model, variables, tl2, None, opt,
            lambda e: cfg2.SOLVER.BASE_LR, loss_fn, num_query, max_epochs=4,
        )
        assert history[-1]["loss"] < history[0]["loss"]
        leaves = jax.tree_util.tree_leaves(state.opt_state.mu)
        assert all(l.dtype == jnp.bfloat16 for l in leaves)

    def test_center_loss_path(self, market_env):
        cfg, (tl2, tl1, val, num_query, num_classes, cams, views) = market_env
        cfg2 = tiny_cfg()
        cfg2.DATASETS.NAMES = cfg.DATASETS.NAMES
        cfg2.MODEL.METRIC_LOSS_TYPE = "triplet_center"
        model, variables = tiny_model(cfg2, num_classes=num_classes)
        loss_fn, (center_init, _) = make_loss(cfg2, num_classes)
        # center feat dim must match the mid feature (vision width)
        centers = jax.random.normal(jax.random.PRNGKey(0), (num_classes, 64))
        centers_before = np.asarray(centers)  # snapshot: steps donate state
        opt = make_optimizer(cfg2.SOLVER, variables["params"], stage="baseline")
        state, history = do_train(
            cfg2, model, variables, tl2, None, opt, lambda e: 1e-3, loss_fn,
            num_query, centers=centers, max_epochs=1,
        )
        # centers moved
        assert not np.allclose(np.asarray(state.centers), centers_before)


class TestEvaluator:
    def test_reference_return_tuple(self):
        ev = R1mAPEvaluator(num_query=4, feat_norm=True)
        rng = np.random.RandomState(0)
        for _ in range(3):
            ev.update((rng.randn(4, 16), rng.randint(0, 3, 4), rng.randint(0, 2, 4)))
        cmc, mAP, distmat, pids, camids, qf, gf = ev.compute()
        assert distmat.shape == (4, 8)
        assert qf.shape == (4, 16) and gf.shape == (8, 16)
        assert len(pids) == 12

    def test_reranking_flag_active(self):
        # unlike the reference, the reranking flag must change the distmat
        rng = np.random.RandomState(1)
        feats = rng.randn(30, 8).astype(np.float32)
        ev1 = R1mAPEvaluator(num_query=10, reranking=False)
        ev2 = R1mAPEvaluator(num_query=10, reranking=True, rerank_k1=6, rerank_k2=3)
        for ev in (ev1, ev2):
            ev.update((feats, np.arange(30) % 5, np.zeros(30, np.int64)))
        d1 = ev1.compute()[2]
        d2 = ev2.compute()[2]
        assert d1.shape == d2.shape
        assert not np.allclose(d1, d2)

    def test_device_array_updates_match_numpy(self):
        """update() accepts device-resident feature chunks (the TTA/eval
        paths keep features on device to skip the fetch+re-upload round
        trip) — metrics must be identical to the numpy-chunk path, mixed
        chunk kinds included."""
        import jax.numpy as jnp

        rng = np.random.RandomState(7)
        chunks = [rng.randn(6, 16).astype(np.float32) for _ in range(3)]
        pids = [rng.randint(0, 4, 6) for _ in range(3)]
        cams = [rng.randint(0, 2, 6) for _ in range(3)]

        ev_np = R1mAPEvaluator(num_query=6, feat_norm=True)
        ev_dev = R1mAPEvaluator(num_query=6, feat_norm=True)
        ev_mix = R1mAPEvaluator(num_query=6, feat_norm=True)
        for i, (f, p, c) in enumerate(zip(chunks, pids, cams)):
            ev_np.update((f, p, c))
            ev_dev.update((jnp.asarray(f), p, c))
            ev_mix.update((jnp.asarray(f) if i % 2 else f, p, c))
        out_np = ev_np.compute()
        for ev in (ev_dev, ev_mix):
            out = ev.compute()
            np.testing.assert_allclose(out[0], out_np[0], atol=1e-6)  # cmc
            assert abs(out[1] - out_np[1]) < 1e-6                     # mAP
            np.testing.assert_allclose(out[2], out_np[2], atol=1e-5)  # distmat


@pytest.fixture(scope="module")
def mmmp_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("mmmp_e")
    make_mmmp(str(root), n_train_ids=4, n_test_ids=3, imgs_per_cam=2)
    cfg = tiny_cfg()
    cfg.DATASETS.NAMES = "mmmp"
    cfg.DATASETS.ROOT_DIR = str(root)
    cfg.DATASETS.EXP_SETTING = "exp_cctv_ir_cctv_rgb"
    cfg.MODEL.ID_LOSS_WEIGHT = 0.25
    loaders = make_dataloader(cfg)
    return cfg, loaders


class TestUniPromptPipeline:
    def test_stage1_then_stage2(self, mmmp_env):
        cfg, (tl2, tl1, val, num_query, num_classes, cams, views) = mmmp_env
        model, variables = tiny_model(cfg, num_classes=num_classes, uniprompt=True)

        bank = build_image_bank(cfg, model, variables, tl1)
        feats, labels, bviews = bank
        assert feats.shape[1] == 32  # embed_dim
        assert len(labels) == len(bviews) == feats.shape[0]

        # stage 1a
        cfg.SOLVER.STAGE1A.MAX_EPOCHS = 2
        opt1a = make_optimizer(cfg.SOLVER.STAGE1A, variables["params"], stage="stage1a")
        sched = make_scheduler(cfg.SOLVER.STAGE1A, "cosine")
        ctx_before = np.asarray(variables["params"]["prompt_learner"]["ctx_generic"])
        vis_before = np.asarray(
            variables["params"]["visual"]["resblocks_0"]["attn"]["in_proj_kernel"]
        )
        variables, hist1a = do_train_stage1(
            cfg, model, variables, tl1, opt1a, sched, is_stage1b=False, bank=bank,
            stage_cfg=cfg.SOLVER.STAGE1A,
        )
        assert not np.allclose(
            np.asarray(variables["params"]["prompt_learner"]["ctx_generic"]), ctx_before
        )
        np.testing.assert_array_equal(
            np.asarray(variables["params"]["visual"]["resblocks_0"]["attn"]["in_proj_kernel"]),
            vis_before,
        )

        # stage 1b trains only modality/platform ctx
        cfg.SOLVER.STAGE1B.MAX_EPOCHS = 2
        opt1b = make_optimizer(cfg.SOLVER.STAGE1B, variables["params"], stage="stage1b")
        modal_before = np.asarray(variables["params"]["prompt_learner"]["ctx_modality"])
        variables, _ = do_train_stage1(
            cfg, model, variables, tl1, opt1b, sched, is_stage1b=True, bank=bank,
            stage_cfg=cfg.SOLVER.STAGE1B,
        )
        assert not np.allclose(
            np.asarray(variables["params"]["prompt_learner"]["ctx_modality"]), modal_before
        )

        # stage 2a
        text_feats = precompute_text_features(cfg, model, variables, num_classes)
        assert text_feats.shape == (num_classes, 32)

        loss_fn, _ = make_loss(cfg, num_classes)
        cfg.SOLVER.STAGE2.BASE_LR = 1e-3
        opt2a = make_optimizer(cfg.SOLVER.STAGE2, variables["params"], stage="stage2a")
        sched2 = make_scheduler(cfg.SOLVER.STAGE2, "multistep")
        ctx_gen_before = np.asarray(variables["params"]["prompt_learner"]["ctx_generic"])
        variables, hist2 = do_train_stage2(
            cfg, model, variables, tl2, None, opt2a, sched2, loss_fn,
            num_query, num_classes, max_epochs=2,
        )
        assert len(hist2) == 2
        # prompt learner frozen in stage 2a
        np.testing.assert_array_equal(
            np.asarray(variables["params"]["prompt_learner"]["ctx_generic"]),
            ctx_gen_before,
        )
        # image encoder moved
        assert not np.allclose(
            np.asarray(variables["params"]["visual"]["resblocks_0"]["attn"]["in_proj_kernel"]),
            vis_before,
        )

        # final inference
        from mpreid_tpu.engine import do_inference_uniprompt

        r1, r5 = do_inference_uniprompt(cfg, model, variables, val, num_query)
        assert 0.0 <= r1 <= 1.0


def test_checkpoint_roundtrip(tmp_path, market_env):
    from mpreid_tpu.engine import initial_state
    from mpreid_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    from mpreid_tpu.solver import make_optimizer

    cfg, (tl2, *_rest) = market_env
    model, variables = tiny_model(cfg, num_classes=4)
    opt = make_optimizer(cfg.SOLVER, variables["params"], stage="baseline")
    state = initial_state(variables, opt)
    save_checkpoint(str(tmp_path / "ckpt"), state, epoch=7)
    restored = load_checkpoint(str(tmp_path / "ckpt"))
    assert int(restored["epoch"]) == 7
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored["params"])
    assert len(a) == len(b)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]))


def test_checkpoint_async_roundtrip_and_error(tmp_path, market_env):
    """TPU.ASYNC_CHECKPOINT: the background write round-trips identically,
    loads wait for in-flight writes, and write failures surface at
    wait_for_pending_saves (not silently on a daemon thread)."""
    import pytest

    from mpreid_tpu.engine import initial_state
    from mpreid_tpu.utils.checkpoint import (
        load_checkpoint, save_checkpoint, wait_for_pending_saves,
    )
    from mpreid_tpu.solver import make_optimizer

    cfg, _loaders = market_env
    cfg = cfg.clone()
    cfg.TPU.ASYNC_CHECKPOINT = True
    model, variables = tiny_model(cfg, num_classes=4)
    opt = make_optimizer(cfg.SOLVER, variables["params"], stage="baseline")
    state = initial_state(variables, opt)
    snap = [np.asarray(l) for l in jax.tree_util.tree_leaves(state.params)]

    save_checkpoint(str(tmp_path / "ckpt_async"), state, epoch=3, cfg=cfg)
    # load_checkpoint must join the writer before reading the path
    restored = load_checkpoint(str(tmp_path / "ckpt_async"))
    assert int(restored["epoch"]) == 3
    got = [np.asarray(l) for l in jax.tree_util.tree_leaves(restored["params"])]
    assert len(snap) == len(got)
    for a, b in zip(snap, got):
        np.testing.assert_array_equal(a, b)
    wait_for_pending_saves()  # idempotent when nothing is pending

    # failure propagation: an unwritable destination (a path under a FILE)
    blocker = tmp_path / "blocker"
    blocker.write_text("x")
    save_checkpoint(str(blocker / "ckpt"), state, epoch=4, cfg=cfg)
    with pytest.raises(RuntimeError, match="async checkpoint write"):
        wait_for_pending_saves()
    wait_for_pending_saves()  # the failed slot is consumed


def test_stage2_device_dataset_mode(mmmp_env):
    """Stage-2 fine-tune with TPU.DEVICE_DATASET runs end-to-end and learns."""
    cfg, (tl2, tl1, val, num_query, num_classes, cams, views) = mmmp_env
    cfg = cfg.clone()
    cfg.TPU.DEVICE_DATASET = True
    model, variables = tiny_model(cfg, num_classes=num_classes, uniprompt=True)
    loss_fn, _ = make_loss(cfg, num_classes)
    cfg.SOLVER.STAGE2.BASE_LR = 1e-3
    opt = make_optimizer(cfg.SOLVER.STAGE2, variables["params"], stage="stage2b")
    variables, hist = do_train_stage2(
        cfg, model, variables, tl2, None, opt, lambda e: 1e-3, loss_fn,
        num_query, num_classes, max_epochs=3,
    )
    assert len(hist) == 3
    assert hist[-1]["loss"] < hist[0]["loss"]
