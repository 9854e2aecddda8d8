"""Shared measured-program builders for bench.py and tools/bench_*.

Every throughput/profiling harness in this repo must time the SAME compiled
programs — bench.py (the recorded artifact), the A/B tools
(tools/bench_stages_ab.py, bench_moments_ab.py, bench_eval_batch.py) and the
profiler (tools/profile_stage2.py) previously each carried a hand copy of
the eval scan and the stage-2 step loop, and the copies had already drifted
(different iters, different cfg knobs). These builders are the single
source of truth; an A/B number and a bench.py number obtained through them
are measurements of the identical program.

Remote-TPU timing rules baked in (see CLAUDE.md): results are FETCHED
(``float(...)``) — ``block_until_ready`` on scalars does not synchronize
under this host's remote runtime; every timed program depends on all output
elements so XLA cannot slice work away; train steps donate their input
state so windows thread it.
"""

from __future__ import annotations

import functools
import time
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# canonical bench environments
# ---------------------------------------------------------------------------

def uniprompt_model(num_classes: int = 1000, camera_num: int = 14,
                    view_num: int = 1, size: Tuple[int, int] = (256, 128),
                    debug_tiny: bool = False):
    """(cfg, model): the canonical Uni-Prompt bench model WITHOUT params.

    No device arrays are created — callers that only need ``clip_config``
    (FLOPs arithmetic, extras assembly) must be able to run even when the
    TPU backend is dead mid-bench."""
    from mpreid_tpu.config import get_default_cfg
    from mpreid_tpu.models import make_model_uniprompt

    cfg = get_default_cfg()
    cfg.MODEL.NAME = "ViT-B-16"
    cfg.MODEL.DEBUG_TINY = debug_tiny
    cfg.INPUT.SIZE_TRAIN = list(size)
    cfg.INPUT.SIZE_TEST = list(size)
    cfg.DATALOADER.SAMPLER = "softmax_triplet"
    cfg.MODEL.ID_LOSS_WEIGHT = 0.25
    model = make_model_uniprompt(
        cfg, num_class=num_classes, camera_num=camera_num, view_num=view_num
    )
    return cfg, model


def uniprompt_env(num_classes: int = 1000, camera_num: int = 14,
                  view_num: int = 1, size: Tuple[int, int] = (256, 128),
                  debug_tiny: bool = False):
    """(cfg, model, variables): the canonical ViT-B/16 @ 256×128 Uni-Prompt
    bench model with the cctv yml loss knobs (PK sampler, ID weight 0.25).

    ``debug_tiny`` shrinks the towers (MODEL.DEBUG_TINY) for CPU smoke
    tests of the harness itself."""
    import jax

    from mpreid_tpu.models import init_variables

    cfg, model = uniprompt_model(
        num_classes=num_classes, camera_num=camera_num, view_num=view_num,
        size=size, debug_tiny=debug_tiny,
    )
    variables = init_variables(model, jax.random.PRNGKey(0), cfg)
    return cfg, model, variables


def rn50_model(num_classes: int = 1000, camera_num: int = 14,
               size: Tuple[int, int] = (256, 128), debug_tiny: bool = False):
    """(cfg, model): the RN50 baseline bench model WITHOUT params."""
    from mpreid_tpu.config import get_default_cfg
    from mpreid_tpu.models import make_model

    cfg = get_default_cfg()
    cfg.MODEL.NAME = "RN50"
    cfg.MODEL.DEBUG_TINY = debug_tiny
    cfg.INPUT.SIZE_TRAIN = list(size)
    cfg.INPUT.SIZE_TEST = list(size)
    cfg.DATALOADER.SAMPLER = "softmax_triplet"
    model = make_model(cfg, num_class=num_classes, camera_num=camera_num,
                       view_num=1)
    return cfg, model


def rn50_env(num_classes: int = 1000, camera_num: int = 14,
             size: Tuple[int, int] = (256, 128), debug_tiny: bool = False):
    """(cfg, model, variables): the RN50 baseline bench model
    (ref configs/person/cnn_base.yml path) at 256×128."""
    import jax

    from mpreid_tpu.models import init_variables

    cfg, model = rn50_model(num_classes=num_classes, camera_num=camera_num,
                            size=size, debug_tiny=debug_tiny)
    variables = init_variables(model, jax.random.PRNGKey(1), cfg)
    return cfg, model, variables


class SyntheticValLoader:
    """In-memory val loader (query rows first, then gallery) whose image
    batches are DEVICE-RESIDENT jnp arrays.

    Drives the *public* eval entry points (``do_inference_tta`` /
    ``do_inference_ttpt``) on-device without measuring this host's
    ~10 MB/s host→device upload cap (CLAUDE.md): ``jnp.asarray`` of an
    already-committed device array is a no-op inside the engine loop.
    pids are drawn from ``n_ids`` so CMC/mAP have real matches; camids
    cycle so the same-pid-same-cam filter keeps positives."""

    def __init__(self, cfg, num_query_batches: int, num_gallery_batches: int,
                 batch: int, n_ids: int = 32,
                 rng: Optional[np.random.RandomState] = None):
        import jax.numpy as jnp

        rng = rng if rng is not None else np.random.RandomState(0)
        h, w = cfg.INPUT.SIZE_TEST
        total_batches = num_query_batches + num_gallery_batches
        total = total_batches * batch
        pids = rng.randint(0, n_ids, total).astype(np.int32)
        camids = (np.arange(total) % 6).astype(np.int32)
        self.num_query = num_query_batches * batch
        self.total = total
        self._batches = []
        for i in range(total_batches):
            sl = slice(i * batch, (i + 1) * batch)
            self._batches.append({
                "images": jnp.asarray(
                    rng.randint(0, 255, (batch, h, w, 3), dtype=np.uint8)
                ),
                "pids": pids[sl],
                "camids": camids[sl],
                "trackids": np.zeros(batch, np.int32),
                "paths": [""] * batch,
                "count": batch,
            })

    def iter_sequential(self):
        return iter(self._batches)


def synthetic_train_batch(batch: int = 64, num_classes: int = 1000,
                          hw: Tuple[int, int] = (256, 128),
                          rng: Optional[np.random.RandomState] = None) -> Dict:
    """The canonical synthetic PK train batch (K=4 instances per identity)."""
    import jax.numpy as jnp

    rng = rng if rng is not None else np.random.RandomState(0)
    h, w = hw
    return {
        "images": jnp.asarray(
            rng.randint(0, 255, (batch, h, w, 3), dtype=np.uint8)
        ),
        "pids": jnp.asarray((np.arange(batch) // 4 % num_classes).astype(np.int32)),
        "camids": jnp.zeros(batch, jnp.int32),
        "trackids": jnp.zeros(batch, jnp.int32),
    }


# ---------------------------------------------------------------------------
# eval forward (gallery extraction) — ONE jitted scan per window
# ---------------------------------------------------------------------------

def make_eval_scan(cfg, model, params, batch_stats,
                   batch: int = 128, iters: int = 40,
                   rng: Optional[np.random.RandomState] = None
                   ) -> Callable[[], float]:
    """``run() -> float``: one scan-compiled eval window (``iters``
    forwards of a ``batch`` of synthetic images), fetched to a float.

    The scan threads a data dependency between iterations and the result
    depends on every output element — immune to host dispatch latency and
    to XLA slicing the batch away. Batch 128 / 40 iters are the measured
    v5e optimum (CLAUDE.md round-3 notes)."""
    import jax
    import jax.numpy as jnp

    from mpreid_tpu.ops.augment import eval_preprocess

    rng = rng if rng is not None else np.random.RandomState(0)
    h, w = cfg.INPUT.SIZE_TEST
    images = jnp.asarray(rng.randint(0, 255, (batch, h, w, 3), dtype=np.uint8))
    mean, std = tuple(cfg.INPUT.PIXEL_MEAN), tuple(cfg.INPUT.PIXEL_STD)

    @functools.partial(jax.jit, static_argnames=("n",))
    def eval_bench(params, batch_stats, images_u8, n):
        def body(carry, _):
            x = eval_preprocess(images_u8 + carry, mean=mean, std=std)
            f = model.apply(
                {"params": params, "batch_stats": batch_stats}, x, train=False
            )
            s = jnp.sum(f.astype(jnp.float32))
            return (s > 1e30).astype(jnp.uint8), s

        carry, sums = jax.lax.scan(body, jnp.zeros((), jnp.uint8), None, length=n)
        return jnp.sum(sums)

    def run() -> float:
        return float(eval_bench(params, batch_stats, images, iters))

    return run


def make_tta_scan(cfg, model, params, batch_stats,
                  batch: int = 128, iters: int = 10,
                  rng: Optional[np.random.RandomState] = None
                  ) -> Callable[[], float]:
    """``run() -> float``: TTA query-feature windows — per image the mean
    feature over {original, h-flip, pseudo-IR, pseudo-RGB} views. The view
    aggregation is the ENGINE's (``engine/ttpt.py::tta_aggregate``, ref
    processor_uniprompt_stage2.py:607-650) — one copy of the
    pseudo-modality math, so this scan cannot drift from the product path.
    Same scan/data-dependency hygiene as ``make_eval_scan``; ~4× its
    per-image cost."""
    import jax
    import jax.numpy as jnp

    from mpreid_tpu.engine.ttpt import tta_aggregate
    from mpreid_tpu.ops.augment import eval_preprocess

    rng = rng if rng is not None else np.random.RandomState(0)
    h, w = cfg.INPUT.SIZE_TEST
    images = jnp.asarray(rng.randint(0, 255, (batch, h, w, 3), dtype=np.uint8))
    mean, std = tuple(cfg.INPUT.PIXEL_MEAN), tuple(cfg.INPUT.PIXEL_STD)

    @functools.partial(jax.jit, static_argnames=("n",))
    def tta_bench(params, batch_stats, images_u8, n):
        def fwd(x):
            return model.apply(
                {"params": params, "batch_stats": batch_stats}, x, train=False
            )

        def body(carry, _):
            x = eval_preprocess(images_u8 + carry, mean=mean, std=std)
            f, _ = tta_aggregate(fwd, x)
            f = f / jnp.linalg.norm(f, axis=1, keepdims=True)
            s = jnp.sum(f.astype(jnp.float32))
            return (s > 1e30).astype(jnp.uint8), s

        carry, sums = jax.lax.scan(body, jnp.zeros((), jnp.uint8), None, length=n)
        return jnp.sum(sums)

    def run() -> float:
        return float(tta_bench(params, batch_stats, images, iters))

    return run


# ---------------------------------------------------------------------------
# stage-1 prompt-training epoch scan
# ---------------------------------------------------------------------------

def stage1_harness(cfg, model, variables, stage: str = "1a",
                   iters: int = 50, batch: int = 64,
                   num_classes: int = 1000, embed_dim: int = 512,
                   random_views: bool = False,
                   rng: Optional[np.random.RandomState] = None,
                   with_state: bool = True) -> Dict[str, Any]:
    """The stage-1 prompt-training workload — the reference's only
    measurable number (50 iters × batch 64, text-encoder fwd+bwd + SupCon
    against a precomputed feature bank; ref
    processor_uniprompt_stage1.py:66-107). The epoch runs as ONE compiled
    scan over the device-resident bank, exactly how do_train_stage1
    executes (engine.steps.make_stage1_epoch).

    ``random_views=True`` draws real view labels (stage-1b trains the
    modality/platform contexts on them)."""
    import jax
    import jax.numpy as jnp

    from mpreid_tpu.engine.steps import make_stage1_epoch
    from mpreid_tpu.engine.train_state import initial_state
    from mpreid_tpu.solver import make_optimizer

    rng = rng if rng is not None else np.random.RandomState(0)
    stage_cfg = cfg.SOLVER.STAGE1B if stage == "1b" else cfg.SOLVER.STAGE1A
    opt = make_optimizer(stage_cfg, variables["params"], stage=f"stage{stage}")
    epoch_fn = make_stage1_epoch(model, cfg, opt, stage=stage)
    # with_state=False: callers that only need opt/bank/labels (e.g. bench
    # --section children) skip the params+moments TrainState copy (~1-2 GB
    # of HBM alloc/free churn on the real chip)
    state = (initial_state(jax.tree_util.tree_map(jnp.array, variables), opt)
             if with_state else None)
    n = iters * batch
    bank = jnp.asarray(rng.randn(n, embed_dim).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, num_classes, n).astype(np.int32))
    views = (jnp.asarray(rng.randint(0, 14, n).astype(np.int32))
             if random_views else jnp.zeros(n, jnp.int32))
    perm = jnp.arange(n).reshape(iters, batch)
    return {
        "epoch_fn": epoch_fn, "state": state, "opt": opt, "bank": bank,
        "labels": labels, "views": views, "perm": perm,
        "iters": iters, "batch": batch,
    }


def epoch_window(harness: Dict[str, Any], lr: float = 3.5e-4
                 ) -> Callable[[], float]:
    """``run() -> seconds``: one stage-1 epoch scan (losses + a param
    element fetched), threading the donated state. First call compiles."""
    import jax
    import jax.numpy as jnp

    e = harness["epoch_fn"]

    def run() -> float:
        state = harness["state"]
        t0 = time.perf_counter()
        state, losses = e(state, harness["bank"], harness["labels"],
                          harness["views"], harness["perm"], lr)
        _ = float(jnp.sum(losses))
        _ = float(jnp.sum(jax.tree_util.tree_leaves(state.params)[0]))
        harness["state"] = state
        return time.perf_counter() - t0

    return run


# ---------------------------------------------------------------------------
# train-step harnesses
# ---------------------------------------------------------------------------

def stage2_harness(cfg, model, variables, num_classes: int = 1000,
                   batch: int = 64, stage: str = "stage2a",
                   rng: Optional[np.random.RandomState] = None,
                   embed_dim: int = 512,
                   with_state: bool = True) -> Dict[str, Any]:
    """The stage-2 fine-tune step (full fwd+bwd + ID/triplet/i2t + Adam;
    ref processor_uniprompt_stage2.py:88-156).

    Returns a dict: ``step``, ``state``, ``batch`` (the canonical synthetic
    PK batch), ``key``, plus the reusable parts (``loss_fn``, ``opt``,
    ``text_features``) for sections that build sibling programs (epoch
    scan, MoE tower) from the same ingredients."""
    import jax
    import jax.numpy as jnp

    from mpreid_tpu.engine.steps import make_train_step
    from mpreid_tpu.engine.train_state import initial_state
    from mpreid_tpu.losses import make_loss
    from mpreid_tpu.solver import make_optimizer

    rng = rng if rng is not None else np.random.RandomState(0)
    loss_fn, _ = make_loss(cfg, num_classes)
    opt = make_optimizer(cfg.SOLVER.STAGE2, variables["params"], stage=stage)
    text_features = jnp.asarray(
        rng.randn(num_classes, embed_dim).astype(np.float32)
    )
    step = make_train_step(model, cfg, loss_fn, opt, uniprompt=True,
                           text_features=text_features)
    # with_state=False: reusable-parts-only callers skip the TrainState
    # copy (params + Adam moments ≈ 1-2 GB HBM churn per build)
    state = (initial_state(jax.tree_util.tree_map(jnp.array, variables), opt)
             if with_state else None)
    b = synthetic_train_batch(batch, num_classes, tuple(cfg.INPUT.SIZE_TRAIN), rng)
    return {
        "step": step, "state": state, "batch": b,
        "key": jax.random.PRNGKey(0),
        "loss_fn": loss_fn, "opt": opt, "text_features": text_features,
    }


def baseline_harness(cfg, model, variables, num_classes: int = 1000,
                     batch: int = 64,
                     rng: Optional[np.random.RandomState] = None
                     ) -> Dict[str, Any]:
    """The baseline train step (ref processor/processor.py:61-88) — used
    for the RN50 path. Same return contract as :func:`stage2_harness`."""
    import jax
    import jax.numpy as jnp

    from mpreid_tpu.engine.steps import make_train_step
    from mpreid_tpu.engine.train_state import initial_state
    from mpreid_tpu.losses import make_loss
    from mpreid_tpu.solver import make_optimizer

    rng = rng if rng is not None else np.random.RandomState(0)
    loss_fn, _ = make_loss(cfg, num_classes)
    opt = make_optimizer(cfg.SOLVER, variables["params"], stage="baseline")
    step = make_train_step(model, cfg, loss_fn, opt)
    state = initial_state(jax.tree_util.tree_map(jnp.array, variables), opt)
    b = synthetic_train_batch(batch, num_classes, tuple(cfg.INPUT.SIZE_TRAIN), rng)
    return {
        "step": step, "state": state, "batch": b,
        "key": jax.random.PRNGKey(0),
        "loss_fn": loss_fn, "opt": opt, "text_features": None,
    }


def step_window(harness: Dict[str, Any], iters: int = 20,
                lr: float = 5e-6) -> Callable[[], float]:
    """``run() -> seconds``: one window of ``iters`` back-to-back step
    dispatches (async; one loss + one param-element fetch at the end),
    threading the donated state inside ``harness``.

    The first call includes compilation — discard it as warmup."""
    import jax
    import jax.numpy as jnp

    step, b, key = harness["step"], harness["batch"], harness["key"]

    def run() -> float:
        state = harness["state"]
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, b, lr, key)
        _ = float(m["loss"])
        _ = float(jnp.sum(jax.tree_util.tree_leaves(state.params)[0]))
        harness["state"] = state
        return time.perf_counter() - t0

    return run


def timed(run: Callable[[], Any]) -> Callable[[], float]:
    """Wrap a value-fetching runner (e.g. :func:`make_eval_scan`'s) into a
    seconds-returning one for :func:`best_of`."""

    def f() -> float:
        t0 = time.perf_counter()
        run()
        return time.perf_counter() - t0

    return f


def best_of(run: Callable[[], float], windows: int = 2,
            warmup: int = 1) -> float:
    """Best-of-N timed windows after ``warmup`` discarded (compile) runs —
    the remote-tunnel latency varies run to run, so min is the honest
    steady-state statistic."""
    for _ in range(warmup):
        run()
    return min(run() for _ in range(windows))
