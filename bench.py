"""Benchmark harness — runs on the real TPU chip.

Primary metric: stage-1a prompt-training throughput (images/sec), directly
comparable to the reference's only measurable number — ≈945 img/s on an
unnamed CUDA GPU (50 iters × batch 64 in ≈3.4 s; reference
``test_output_wizMandD/exp_cctv_ir_cctv_rgb/train_log.txt:299-303``, loop at
``processor/processor_uniprompt_stage1.py:66-107``). The workload is
identical: batch-64 prompt-context training steps (text-encoder fwd+bwd +
SupCon i2t/t2i) against a precomputed image-feature bank, ViT-B/16 CLIP
scale, 1000 identities.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Crash-resilient architecture (round 5 — round 4's artifact lost five
sections to one TPU worker crash):

* Every measurement is a named SECTION in a registry; ``python bench.py
  --section NAME [--smoke]`` runs exactly one section in a fresh process
  and prints a marker-prefixed JSON line (also the crash-bisect tool).
* The matmul ceiling runs FIRST — every ``mfu_*_vs_measured_matmul``
  divides by it, so it must never depend on the tail surviving.
* The two highest-risk sections (``msmt_rerank``: ~12 GB peak HBM;
  ``uniprompt_pipeline``: the whole product in one process) ALWAYS run as
  isolated subprocesses, after the parent frees its device state — a
  worker crash inside one costs that section only.
* The per-section guard classifies dead-backend errors (UNAVAILABLE /
  "worker crashed"): once the in-process client is broken, every
  remaining section is dispatched to a fresh subprocess (whose own
  ``wait_for_backend`` probe waits out the worker restart) instead of
  burning the rest of the run on a dead connection.

Sections run standalone use fresh-initialized parameters — every recorded
number is throughput of a compiled program and does not depend on
parameter VALUES.
"""

import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))

REFERENCE_STAGE1A_IMG_PER_SEC = 945.0  # see module docstring

# Reference utils/reranking.py (NumPy, CPU) measured on this host at
# Market-1501 protocol scale (Q=3368, G=15913, 512-d clustered features,
# k1=50, k2=15): 228.5 s. Same data through our TPU fast path below.
REFERENCE_RERANK_SECONDS = 228.5

# Nominal dense bf16 peak TFLOP/s by device_kind, for the MFU denominator.
# (Public spec-sheet numbers; the empirically measured matmul ceiling is
# reported alongside and is the more honest denominator on this host.)
PEAK_BF16_TFLOPS = {
    "TPU v2": 45.0,
    "TPU v3": 123.0,
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,
    "TPU v5e": 197.0,
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,
    "TPU v6e": 918.0,
    "TPU7x": 2307.0,
}

# One marker line per --section child: everything else on stdout (training
# logs, jax warnings) is ignored by the parent's parser.
_SECTION_MARKER = "BENCH_SECTION_JSON: "

# Shared persistent XLA compile cache for the bench parent AND its
# --section subprocesses: the msmt blend alone compiles for ~25 min cold
# (measured r5); with the cache, the second bench run and the subprocess
# re-compiles hit disk instead of the compiler.
_COMPILE_CACHE_DIR = "/tmp/mpreid_tpu_bench_jax_cache"


def _enable_compile_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", _COMPILE_CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:  # noqa: BLE001 — cache is best-effort
        print(f"bench: compile cache unavailable ({e})", file=sys.stderr)


def vit_flops_per_image(clip_config, num_classes: int) -> float:
    """Analytic forward FLOPs/image of the ReID ViT path (matmuls only;
    elementwise/LN are <1% and ride the VPU).

    Counts: conv patchify, per-block QKV/out projections (8·N·D²), attention
    score+value matmuls (4·N²·D), MLP (16·N·D²), final LN proj of all tokens
    (ref clip/model.py:471-474 projects every token), BNNeck classifiers.
    """
    c = clip_config
    n = c.h_resolution * c.w_resolution + 1
    d = c.vision_width
    e = c.embed_dim
    per_block = 24 * n * d * d + 4 * n * n * d
    conv = 2 * n * d * 3 * c.vision_patch_size * c.vision_patch_size
    proj = 2 * n * d * e
    heads = 2 * d * num_classes + 2 * e * num_classes
    return c.vision_layers * per_block + conv + proj + heads


def rn50_flops_per_image(clip_config, in_planes: int, num_classes: int) -> float:
    """Analytic forward FLOPs/image of the ReID ModifiedResNet-50 path
    (matmul/conv terms only; BN/ReLU ride the VPU).

    Mirrors our ``models/resnet.py`` (= ref ``model/clip/model.py:92-148``
    with the ReID last-stride-1 modification): 3-conv stem (stride 2 +
    avgpool), four Bottleneck stages (layer4 stride 1 → total reduction
    16×, so the final grid is h_resolution × w_resolution), attention
    pooling, BNNeck classifiers.
    """
    c = clip_config
    H, W = c.h_resolution * 16, c.w_resolution * 16
    w = c.vision_width
    h2, w2 = H // 2, W // 2
    f = (
        2 * h2 * w2 * 3 * (w // 2) * 9
        + 2 * h2 * w2 * (w // 2) * (w // 2) * 9
        + 2 * h2 * w2 * (w // 2) * w * 9
    )
    inp = w
    res = (H // 4, W // 4)
    stage_strides = (1, 2, 2, 1)  # layer4 stride 1: ReID modification
    for s, blocks in enumerate(c.vision_layers):
        planes = w * (2 ** s)
        outp = 4 * planes
        for b in range(blocks):
            stride = stage_strides[s] if b == 0 else 1
            hin, win = res
            hout, wout = hin // stride, win // stride
            f += 2 * hin * win * inp * planes          # conv1 1×1
            f += 2 * hin * win * planes * planes * 9   # conv2 3×3
            f += 2 * hout * wout * planes * outp       # conv3 1×1
            if b == 0:
                f += 2 * hout * wout * inp * outp      # downsample 1×1
            inp = outp
            res = (hout, wout)
    n = c.h_resolution * c.w_resolution + 1
    f += 3 * 2 * n * inp * inp          # attnpool q/k/v projections
    # full n×n attention: models/resnet.py AttentionPool2d projects q for
    # every token and returns all output tokens (callers take index 0)
    f += 2 * 2 * n * n * inp            # scores + values, all n queries
    f += 2 * n * inp * c.embed_dim      # c_proj
    f += 2 * in_planes * num_classes + 2 * c.embed_dim * num_classes
    return f


def measure_matmul_ceiling_tflops(iters: int = 400, size: int = 4096) -> float:
    """Empirical bf16 matmul ceiling on this chip: a chain of size³ matmuls
    with a data dependency between iterations, inside one jitted scan.

    The chain must be LONG: the remote TPU tunnel adds ~20 ms fixed latency
    per result fetch, so a short chain measures the tunnel, not the MXU
    (16 iters read 60 TFLOP/s on a chip whose 400-iter chain reads 175).
    The inter-iteration op is a single constant scale in bf16 — any
    reduction-based renormalization costs several HBM passes per iteration
    and shaves ~10% off the measured ceiling."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    a = jnp.asarray(np.random.RandomState(1).randn(size, size), jnp.bfloat16)
    b = jnp.asarray(np.random.RandomState(2).randn(size, size), jnp.bfloat16)

    @jax.jit
    def chain(a, b):
        def body(x, _):
            y = jnp.dot(x, b, preferred_element_type=jnp.bfloat16)
            # constant rescale keeps the chain bounded: ||xB|| grows ~√size
            return y * jnp.bfloat16(1.0 / 64.0), ()
        x, _ = jax.lax.scan(body, a, None, length=iters)
        return jnp.sum(x.astype(jnp.float32))

    _ = float(chain(a, b))  # compile
    dts = []
    for _ in range(2):
        t0 = time.perf_counter()
        _ = float(chain(a, b))
        dts.append(time.perf_counter() - t0)
    flops = iters * 2.0 * size ** 3
    return flops / min(dts) / 1e12


def wait_for_backend(max_wait_s: float = 900.0, probe_timeout_s: float = 120.0,
                     retry_sleep_s: float = 30.0, probe_argv=None) -> bool:
    """Block until the TPU backend answers, up to ``max_wait_s``.

    The remote tunnel has two transient failure modes (observed on this
    host): backend init raising UNAVAILABLE, and a wedged tunnel that HANGS
    with zero CPU. Both would kill the bench before the per-section fault
    guards exist, so the probe runs in a SUBPROCESS with a hard timeout —
    a hang in the child is killed and retried, never inherited. Returns
    True once a probe sees a device; False when the budget is exhausted
    (the caller proceeds and fails with the real error)."""
    import subprocess

    argv = probe_argv or [
        sys.executable, "-c", "import jax; assert len(jax.devices()) > 0"
    ]
    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        # cap each probe by the remaining budget so the deadline is
        # enforced, not advisory (a hung probe otherwise overshoots it
        # by up to a full probe_timeout_s)
        this_timeout = min(probe_timeout_s,
                           max(1.0, deadline - time.monotonic()))
        try:
            r = subprocess.run(argv, timeout=this_timeout,
                               capture_output=True)
            if r.returncode == 0:
                return True
            reason = f"exit {r.returncode}"
        except subprocess.TimeoutExpired:
            reason = f"hang >{this_timeout:.0f}s (wedged tunnel?)"
        remaining = deadline - time.monotonic()
        print(f"bench: backend probe {attempt} failed ({reason}); "
              f"{remaining:.0f}s of retry budget left", file=sys.stderr)
        if remaining <= retry_sleep_s:
            return False
        time.sleep(retry_sleep_s)


def _backend_dead_error(e: BaseException) -> bool:
    """Does this exception mean the in-process TPU client is broken (vs an
    ordinary section failure)? Matches the observed worker-crash /
    tunnel-loss signatures; deliberately does NOT match DEADLINE_EXCEEDED
    (long compiles trip RPC deadlines while the backend is healthy)."""
    s = f"{type(e).__name__}: {e}".lower()
    return any(n in s for n in (
        # gRPC status prefix ("UNAVAILABLE: <details>") — the colon keeps
        # prose like "feature unavailable on this platform" from flipping
        # every later section to subprocess mode
        "unavailable:",
        "worker process crashed",
        "crashed or restarted",
        "socket closed",
        "connection reset",
        "failed to connect",
    ))


# ---------------------------------------------------------------------------
# shared lazy environment
# ---------------------------------------------------------------------------

class BenchCtx:
    """Lazy shared environment for sections.

    The full run shares one env across sections (and threads the post-
    stage-1a params into the eval-flavored sections); a ``--section`` child
    builds only what its one section needs, from fresh-initialized
    variables. Throughput numbers do not depend on parameter values."""

    def __init__(self, smoke: bool):
        self.smoke = smoke
        self.num_classes = 12 if smoke else 1000
        self.batch = 8 if smoke else 64
        self.img_size = (64, 32) if smoke else (256, 128)
        self.iters = 3 if smoke else 50          # stage-1 window length
        self.eval_iters = 2 if smoke else 40
        self.eval_batch = 8 if smoke else 128
        self.s2_iters = 2 if smoke else 20
        self._cfg_model = None
        self._variables = None
        self._rn50 = None
        self._post1a = None      # stage-1a harness (state/opt/bank/labels)
        self._h2_parts = None    # loss_fn/opt/text_features/batch/key

    # -- flagship env -------------------------------------------------------
    @property
    def cfg_model(self):
        """(cfg, model) — no device arrays; safe on a dead backend."""
        if self._cfg_model is None:
            from mpreid_tpu.utils import benchkit

            cfg, model = benchkit.uniprompt_model(
                num_classes=self.num_classes, size=self.img_size,
                debug_tiny=self.smoke,
            )
            cfg.SOLVER.STAGE1A.IMS_PER_BATCH = self.batch
            self._cfg_model = (cfg, model)
        return self._cfg_model

    @property
    def variables(self):
        if self._variables is None:
            import jax

            from mpreid_tpu.models import init_variables

            cfg, model = self.cfg_model
            self._variables = init_variables(model, jax.random.PRNGKey(0), cfg)
        return self._variables

    @property
    def embed_dim(self):
        return self.cfg_model[1].clip_config.embed_dim

    def fresh_vars(self):
        """Steps donate their input state — every benchmark state is built
        from a copy of the canonical variables."""
        import jax
        import jax.numpy as jnp

        return jax.tree_util.tree_map(jnp.array, self.variables)

    def rng(self, seed: int = 0):
        import numpy as np

        return np.random.RandomState(seed)

    # -- cross-section shared pieces ---------------------------------------
    def stage1_ingredients(self):
        """The stage-1a harness (opt/bank/labels + maybe post-train state).

        Populated by the stage1a section in the full run; built fresh (and
        its unused initial state dropped) in standalone mode."""
        if self._post1a is None:
            from mpreid_tpu.utils import benchkit

            cfg, model = self.cfg_model
            h = benchkit.stage1_harness(
                cfg, model, self.variables, stage="1a", iters=self.iters,
                batch=self.batch, num_classes=self.num_classes,
                embed_dim=self.embed_dim,
                with_state=False,  # standalone callers only need opt/bank/labels
            )
            self._post1a = h
        return self._post1a

    def eval_params(self):
        """(params, batch_stats): post-stage-1a when available, fresh
        otherwise."""
        p = self._post1a
        if p is not None and p.get("state") is not None:
            return p["state"].params, p["state"].batch_stats
        v = self.variables
        return v["params"], v.get("batch_stats", {})

    def h2_parts(self):
        """loss_fn/opt/text_features/batch/key shared by the stage-2 family
        (the harness's initial state is NOT kept — sections build and free
        their own)."""
        if self._h2_parts is None:
            from mpreid_tpu.utils import benchkit

            cfg, model = self.cfg_model
            h2 = benchkit.stage2_harness(
                cfg, model, self.variables, num_classes=self.num_classes,
                batch=self.batch, embed_dim=self.embed_dim,
                with_state=False,  # reusable parts only
            )
            self._h2_parts = h2
        return self._h2_parts

    def rn50(self):
        if self._rn50 is None:
            from mpreid_tpu.utils import benchkit

            self._rn50 = benchkit.rn50_env(
                num_classes=self.num_classes, size=self.img_size,
                debug_tiny=self.smoke,
            )
        return self._rn50

    def free_device_state(self):
        """Drop every device-array reference this context holds (params +
        Adam moments ≈ 1.2-2 GB per live TrainState) so the isolated
        subprocess sections own the chip's HBM. cfg/model survive — the
        extras assembly needs clip_config for FLOPs arithmetic only."""
        self._variables = None
        self._post1a = None
        self._h2_parts = None
        self._rn50 = None
        import gc

        gc.collect()


# ---------------------------------------------------------------------------
# sections
# ---------------------------------------------------------------------------

SECTIONS = {}


def section(name):
    def deco(fn):
        SECTIONS[name] = fn
        return fn
    return deco


@section("matmul_ceiling")
def sec_matmul_ceiling(ctx):
    """Runs FIRST: every mfu_*_vs_measured_matmul divides by this."""
    tf = (measure_matmul_ceiling_tflops(iters=4, size=256) if ctx.smoke
          else measure_matmul_ceiling_tflops())
    return {"matmul_tflops_measured": tf}


@section("stage1a")
def sec_stage1a(ctx):
    """The headline: stage-1a prompt-training epoch scan, best-of-2
    windows (engine.steps.make_stage1_epoch — exactly how do_train_stage1
    executes an epoch; 50-iter window = the reference's measured window).
    Stashes the post-train harness so eval/tta/ttpt reuse its params."""
    from mpreid_tpu.utils import benchkit

    cfg, model = ctx.cfg_model
    h1a = benchkit.stage1_harness(
        cfg, model, ctx.variables, stage="1a", iters=ctx.iters,
        batch=ctx.batch, num_classes=ctx.num_classes,
        embed_dim=ctx.embed_dim,
    )
    dt = benchkit.best_of(benchkit.epoch_window(h1a), windows=2)
    ctx._post1a = h1a
    return {
        "_stage1a_img_per_sec": ctx.iters * ctx.batch / dt,
        "stage1a_sec_per_iter": dt / ctx.iters,
    }


@section("stage1a_dispatch")
def sec_stage1a_dispatch(ctx):
    """Same workload as the headline but one host dispatch per optimizer
    step — so the scan number can't be attributed to epoch batching alone.
    Steps dispatch back-to-back (async) with one result fetch at the end;
    per-iter host syncs would measure the remote tunnel's RTT."""
    import jax
    import jax.numpy as jnp

    from mpreid_tpu.engine.steps import make_stage1_step
    from mpreid_tpu.engine.train_state import initial_state

    ing = ctx.stage1_ingredients()
    cfg, model = ctx.cfg_model
    optimizer, bank, bank_labels = ing["opt"], ing["bank"], ing["labels"]
    batch, iters = ctx.batch, ctx.iters
    step1 = make_stage1_step(model, cfg, optimizer, stage="1a")
    state1i = initial_state(ctx.fresh_vars(), optimizer)
    views64 = jnp.zeros(batch, jnp.int32)
    state1i, m1 = step1(
        state1i, bank[:batch], bank_labels[:batch], views64, 3.5e-4
    )
    _ = float(m1["loss"])  # compile
    iter_dts = []
    for _ in range(2):
        t0 = time.perf_counter()
        for i in range(iters):
            lo = i * batch
            state1i, m1 = step1(
                state1i, bank[lo:lo + batch], bank_labels[lo:lo + batch],
                views64, 3.5e-4,
            )
        _ = float(m1["loss"])
        _ = float(jnp.sum(jax.tree_util.tree_leaves(state1i.params)[0]))
        iter_dts.append(time.perf_counter() - t0)
    del state1i  # free HBM (params + Adam moments ≈ 1.2 GB per TrainState)
    return {"stage1a_img_per_sec_per_iter_dispatch": iters * batch / min(iter_dts)}


@section("eval_scan")
def sec_eval_scan(ctx):
    """Gallery feature extraction (eval forward, bf16): ONE jitted lax.scan
    per window with a data dependency between iterations — immune to host
    dispatch latency, request caching, or overlap in the remote runtime.
    Batch 128 / 40 iters: the measured v5e optimum."""
    from mpreid_tpu.utils import benchkit

    cfg, model = ctx.cfg_model
    params, bstats = ctx.eval_params()
    eval_run = benchkit.make_eval_scan(
        cfg, model, params, bstats, batch=ctx.eval_batch, iters=ctx.eval_iters,
    )
    eval_dt = benchkit.best_of(benchkit.timed(eval_run), windows=2)
    return {"gallery_feats_per_sec_per_chip":
            ctx.eval_iters * ctx.eval_batch / eval_dt}


@section("stage2_dispatch")
def sec_stage2_dispatch(ctx):
    """Stage-2 fine-tune step (full ViT fwd+bwd + losses + Adam), one host
    dispatch per step (ref processor_uniprompt_stage2.py:88-156)."""
    from mpreid_tpu.utils import benchkit

    cfg, model = ctx.cfg_model
    h2 = benchkit.stage2_harness(
        cfg, model, ctx.variables, num_classes=ctx.num_classes,
        batch=ctx.batch, embed_dim=ctx.embed_dim,
    )
    s2_dt = benchkit.best_of(
        benchkit.step_window(h2, iters=ctx.s2_iters), windows=2
    )
    h2["state"] = None  # free HBM; keep the reusable parts for siblings
    ctx._h2_parts = h2
    return {"stage2_img_per_sec_per_step_dispatch":
            ctx.s2_iters * ctx.batch / s2_dt}


@section("stage2_epoch_scan")
def sec_stage2_epoch_scan(ctx):
    """Production stage-2 path on this host (TPU.DEVICE_DATASET): the whole
    epoch is ONE compiled scan over device-resident images — no per-step
    host dispatch. This is the headline stage-2 number.

    Scan length: a real Market-scale stage-2 epoch is ~186 iterations; a
    20-iter scan under-reports production throughput because the per-epoch
    constants (2 tunnel result fetches at ~20-40 ms each, partition/merge,
    dispatch) don't amortize. The xplane profile (tools/profile_stage2.py
    --epoch, r4) shows the scan BODY at ~34.2 ms/iter device — equal to
    the bare step, zero carry overhead — so we scan 100 iters (the
    permutation tiled over the same device-resident images, as a PK
    sampler revisits images across epochs) to measure the amortized rate."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mpreid_tpu.engine.steps import make_train_epoch
    from mpreid_tpu.engine.train_state import initial_state
    from mpreid_tpu.utils import benchkit

    cfg, model = ctx.cfg_model
    parts = ctx.h2_parts()
    loss_fn, opt2 = parts["loss_fn"], parts["opt"]
    text_features, key = parts["text_features"], parts["key"]
    batch, s2_iters, num_classes = ctx.batch, ctx.s2_iters, ctx.num_classes
    epoch2 = make_train_epoch(
        model, cfg, loss_fn, opt2, uniprompt=True, text_features=text_features
    )
    tile_factor = 5  # 100 scan iters on the real run, 10 in smoke
    n_data = s2_iters * batch
    scan_iters = tile_factor * s2_iters
    th, tw = cfg.INPUT.SIZE_TRAIN
    rng = ctx.rng(0)
    ds_images = jnp.asarray(
        rng.randint(0, 255, (n_data, th, tw, 3), dtype=np.uint8)
    )
    ds_pids = jnp.asarray((np.arange(n_data) // 4 % num_classes).astype(np.int32))
    ds_zeros = jnp.zeros(n_data, jnp.int32)
    perm2 = jnp.tile(jnp.arange(n_data), tile_factor).reshape(scan_iters, batch)
    h2e = {"state": initial_state(ctx.fresh_vars(), opt2)}

    def run() -> float:
        state2e = h2e["state"]
        t0 = time.perf_counter()
        state2e, (l2, a2) = epoch2(
            state2e, ds_images, ds_pids, ds_zeros, ds_zeros, perm2, 5e-6, key
        )
        _ = float(jnp.sum(l2))
        _ = float(jnp.sum(jax.tree_util.tree_leaves(state2e.params)[0]))
        h2e["state"] = state2e
        return time.perf_counter() - t0

    s2e_dt = benchkit.best_of(run, windows=2)
    h2e["state"] = None
    return {"stage2_train_img_per_sec": scan_iters * batch / s2e_dt}


@section("stage2_b128")
def sec_stage2_b128(ctx):
    """Stage-2 at batch 128: the Adam update's HBM traffic (~3.5 ms for the
    87M trainable params, batch-independent) amortizes over 2× the images
    and the larger matmuls tile the MXU better. Batch 64 is the reference's
    config (the parity point); this is the tuned production batch."""
    from mpreid_tpu.utils import benchkit

    cfg, model = ctx.cfg_model
    b128 = 2 * ctx.batch
    h2l = benchkit.stage2_harness(
        cfg, model, ctx.variables, num_classes=ctx.num_classes, batch=b128,
        embed_dim=ctx.embed_dim,
    )
    dtl = benchkit.best_of(
        benchkit.step_window(h2l, iters=ctx.s2_iters), windows=2
    )
    h2l["state"] = None  # free HBM
    return {"stage2_b128_img_per_sec": ctx.s2_iters * b128 / dtl}


@section("stage1b")
def sec_stage1b(ctx):
    """Stage-1b prompt training: identical loop shape to 1a but training
    the modality/platform contexts with real view labels (ref
    train_uniprompt.py:102-122)."""
    from mpreid_tpu.utils import benchkit

    cfg, model = ctx.cfg_model
    h1b = benchkit.stage1_harness(
        cfg, model, ctx.variables, stage="1b", iters=ctx.iters,
        batch=ctx.batch, num_classes=ctx.num_classes,
        embed_dim=ctx.embed_dim, random_views=True,
    )
    dt1b = benchkit.best_of(benchkit.epoch_window(h1b), windows=2)
    return {"stage1b_img_per_sec": ctx.iters * ctx.batch / dt1b}


@section("stage2b_moe")
def sec_stage2b_moe(ctx):
    """Stage-2b fine-tune on the upcycled MoE vision tower (4 experts,
    top-2, 2 MoE layers) under the stage-2b freeze regime (ref
    train_uniprompt.py:187-208, make_optimizer_prompt.py:111-152)."""
    import jax
    import jax.numpy as jnp

    from mpreid_tpu.engine.steps import make_train_step
    from mpreid_tpu.engine.train_state import initial_state
    from mpreid_tpu.models import switch_to_moe
    from mpreid_tpu.solver import make_optimizer
    from mpreid_tpu.utils import benchkit

    cfg, model = ctx.cfg_model
    parts = ctx.h2_parts()
    moe_saved = {
        k: getattr(cfg.MODEL.MOE, k)
        for k in ("ENABLED", "NUM_EXPERTS", "TOP_K", "MOE_LAYERS")
    }
    cfg.MODEL.MOE.ENABLED = True
    cfg.MODEL.MOE.NUM_EXPERTS = 4
    cfg.MODEL.MOE.TOP_K = 2
    cfg.MODEL.MOE.MOE_LAYERS = 2
    try:
        moe_model, moe_vars = switch_to_moe(cfg, model, ctx.variables)
        opt2b = make_optimizer(cfg.SOLVER.STAGE2, moe_vars["params"],
                               stage="stage2b")
        step2b = make_train_step(
            moe_model, cfg, parts["loss_fn"], opt2b, uniprompt=True,
            text_features=parts["text_features"],
        )
        h2b = {
            "step": step2b,
            "state": initial_state(
                jax.tree_util.tree_map(jnp.array, moe_vars), opt2b
            ),
            "batch": parts["batch"], "key": parts["key"],
        }
        dt2b = benchkit.best_of(
            benchkit.step_window(h2b, iters=ctx.s2_iters), windows=2
        )
        h2b["state"] = None
        return {"stage2b_moe_img_per_sec": ctx.s2_iters * ctx.batch / dt2b}
    finally:
        for k, v in moe_saved.items():
            setattr(cfg.MODEL.MOE, k, v)


@section("rn50_eval")
def sec_rn50_eval(ctx):
    """RN50 eval throughput (ref configs/person/cnn_base.yml path)."""
    from mpreid_tpu.utils import benchkit

    cfg_rn, rn_model, rn_vars = ctx.rn50()
    rn_eval = benchkit.make_eval_scan(
        cfg_rn, rn_model, rn_vars["params"], rn_vars["batch_stats"],
        batch=ctx.eval_batch, iters=ctx.eval_iters,
    )
    rn_eval_dt = benchkit.best_of(benchkit.timed(rn_eval), windows=2)
    return {
        "rn50_eval_feats_per_sec": ctx.eval_iters * ctx.eval_batch / rn_eval_dt,
        "_rn50_flops": rn50_flops_per_image(
            rn_model.clip_config, rn_model.in_planes, ctx.num_classes
        ),
    }


@section("rn50_train")
def sec_rn50_train(ctx):
    """RN50 baseline train step (ref processor/processor.py:61-88)."""
    from mpreid_tpu.utils import benchkit

    cfg_rn, rn_model, rn_vars = ctx.rn50()
    hrn = benchkit.baseline_harness(
        cfg_rn, rn_model, rn_vars, num_classes=ctx.num_classes, batch=ctx.batch
    )
    rn_dt = benchkit.best_of(
        benchkit.step_window(hrn, iters=ctx.s2_iters), windows=2
    )
    hrn["state"] = None
    return {
        "rn50_train_img_per_sec": ctx.s2_iters * ctx.batch / rn_dt,
        "_rn50_flops": rn50_flops_per_image(
            rn_model.clip_config, rn_model.in_planes, ctx.num_classes
        ),
    }


@section("market_rerank")
def sec_market_rerank(ctx):
    """Market-scale k-reciprocal re-ranking wall-clock (dense TPU path)."""
    import jax.numpy as jnp
    import numpy as np

    from mpreid_tpu.ops.reranking import re_ranking

    rng = ctx.rng(0)
    Q, G, D = (40, 200, 32) if ctx.smoke else (3368, 15913, 512)
    n_ids = 10 if ctx.smoke else 750
    centers = rng.randn(n_ids, D).astype(np.float32)
    qf = jnp.asarray(
        (centers[rng.randint(0, n_ids, Q)]
         + rng.randn(Q, D) * 0.7).astype(np.float32)
    )
    gf = jnp.asarray(
        (centers[rng.randint(0, n_ids, G)]
         + rng.randn(G, D) * 0.7).astype(np.float32)
    )
    d = re_ranking(qf, gf, k1=50, k2=15, fast_minsum=True)
    _ = float(jnp.sum(d))  # compile + run
    rr_dts = []
    for _ in range(2):
        t0 = time.perf_counter()
        d = re_ranking(qf, gf, k1=50, k2=15, fast_minsum=True)
        _ = float(jnp.sum(d))
        rr_dts.append(time.perf_counter() - t0)
    return {"market_scale_rerank_seconds": min(rr_dts)}


@section("msmt_rerank")
def sec_msmt_rerank(ctx):
    """MSMT17-scale re-ranking (sparse-V path, beyond dense HBM).

    N≈94k: the dense path needs several 35 GB matrices and cannot run on a
    16 GB chip; the sparse path (ops/reranking_sparse.py) holds O(N·W).
    Quantized MXU min-sum for the full (Q, G) matrix; then a sampled block
    of query rows is recomputed with the EXACT sparse min-sum as the
    on-chip oracle (the NumPy oracle is O(N²) memory and cannot run at
    this scale either) to bound the quantization at VALUE level (max abs
    err) and at RANK level (top-1 disagreement + rank-1/mAP deltas against
    the synthetic cluster identities — VERDICT r4 task #3; the evaluator
    auto-selects the quantized mode above TEST.RERANK_SPARSE_N).

    ALWAYS runs as an isolated subprocess: peak HBM is ~12 GB — sharing
    the chip with the parent's live states is the prime suspect for the
    round-4 worker crash."""
    import jax.numpy as jnp
    import numpy as np

    from mpreid_tpu.ops.reranking_sparse import (
        re_ranking_sparse, re_ranking_sparse_rows,
    )

    rng = ctx.rng(0)
    Q, G, D = (24, 100, 16) if ctx.smoke else (11659, 82161, 512)
    n_ids = 8 if ctx.smoke else 3000
    n_rows = 8 if ctx.smoke else 64
    kw = dict(k1=50, k2=15)
    if ctx.smoke:
        kw = dict(k1=10, k2=4, block=32, g_chunk=32)
    centers = rng.randn(n_ids, D).astype(np.float32)
    q_ids = rng.randint(0, n_ids, Q)
    g_ids = rng.randint(0, n_ids, G)
    qf = jnp.asarray(
        (centers[q_ids] + rng.randn(Q, D) * 0.7).astype(np.float32)
    )
    gf = jnp.asarray(
        (centers[g_ids] + rng.randn(G, D) * 0.7).astype(np.float32)
    )
    d = re_ranking_sparse(qf, gf, minsum="quantized", **kw)
    _ = float(jnp.sum(d))  # compile + run
    t0 = time.perf_counter()
    d = re_ranking_sparse(qf, gf, minsum="quantized", **kw)
    _ = float(jnp.sum(d))  # one timed window: a full run is minutes
    dt = time.perf_counter() - t0
    rows = np.linspace(0, Q - 1, n_rows).astype(np.int32)
    d_rows = np.asarray(d[jnp.asarray(rows)])
    del d  # free the (Q, G) matrix before the oracle's construction
    exact_rows = np.asarray(re_ranking_sparse_rows(
        qf, gf, jnp.asarray(rows), **kw
    ))
    err = float(np.max(np.abs(d_rows - exact_rows)))

    # rank-level agreement on the sampled rows (the metric the evaluator's
    # auto-selected quantized mode actually affects)
    def rank_metrics(dist_rows):
        order = np.argsort(dist_rows, axis=1)
        top1 = g_ids[order[:, 0]]
        r1 = float(np.mean(top1 == q_ids[rows]))
        aps = []
        for i, r in enumerate(rows):
            rel = (g_ids[order[i]] == q_ids[r])
            if not rel.any():
                continue
            hits = np.cumsum(rel)
            prec = hits / (np.arange(len(rel)) + 1)
            aps.append(float(np.sum(prec * rel) / rel.sum()))
        return r1, float(np.mean(aps)) if aps else 0.0, order[:, 0]

    r1_q, map_q, top1_q = rank_metrics(d_rows)
    r1_e, map_e, top1_e = rank_metrics(exact_rows)
    return {
        "msmt_scale_rerank_seconds": dt,
        "msmt_rerank_sampled_rows_max_err_vs_exact": err,
        "msmt_rerank_rank1_delta": r1_q - r1_e,
        "msmt_rerank_map_delta_sampled": map_q - map_e,
        "msmt_rerank_top1_disagreement": float(np.mean(top1_q != top1_e)),
    }


@section("tta")
def sec_tta(ctx):
    """The PUBLIC TTA eval path end-to-end: ``do_inference_tta`` (engine/
    ttpt.py, ref processor_uniprompt_stage2.py:607-650) over a synthetic
    device-resident val loader — per-batch dispatch, query/gallery split,
    feature fetch to host, CMC/mAP included. The r4 bench timed a private
    scan re-implementation instead (VERDICT r4 task #5)."""
    from mpreid_tpu.engine.ttpt import do_inference_tta
    from mpreid_tpu.utils import benchkit

    cfg, model = ctx.cfg_model
    params, bstats = ctx.eval_params()
    variables = {"params": params, "batch_stats": bstats}
    nq, ng = (1, 1) if ctx.smoke else (4, 4)
    loader = benchkit.SyntheticValLoader(
        cfg, num_query_batches=nq, num_gallery_batches=ng,
        batch=ctx.eval_batch, rng=ctx.rng(3),
    )
    saved = cfg.TEST.RE_RANKING
    cfg.TEST.RE_RANKING = False
    try:
        def run():
            t0 = time.perf_counter()
            do_inference_tta(cfg, model, variables, loader, loader.num_query)
            return time.perf_counter() - t0

        dt = benchkit.best_of(run, windows=2)
    finally:
        cfg.TEST.RE_RANKING = saved
    return {"tta_feats_per_sec": loader.total / dt}


@section("ttpt")
def sec_ttpt(ctx):
    """The PUBLIC TTPT eval path end-to-end: ``do_inference_ttpt`` — per
    query batch, STEPS entropy-minimizing AdamW updates on ctx_generic
    (each step a full text-tower fwd+bwd over all classes), class
    selection, text-feature retrieval against the gallery projection (ref
    processor_uniprompt_stage2.py:359-476). STEPS=4; queries/sec counts
    query images over the WHOLE run (gallery extraction included — that is
    what a user pays)."""
    from mpreid_tpu.engine.ttpt import do_inference_ttpt
    from mpreid_tpu.utils import benchkit

    cfg, model = ctx.cfg_model
    params, bstats = ctx.eval_params()
    variables = {"params": params, "batch_stats": bstats}
    nq, ng = (1, 1) if ctx.smoke else (2, 2)
    loader = benchkit.SyntheticValLoader(
        cfg, num_query_batches=nq, num_gallery_batches=ng,
        batch=ctx.eval_batch, rng=ctx.rng(4),
    )
    saved = (cfg.TEST.TTPT.ENABLED, cfg.TEST.TTPT.STEPS, cfg.TEST.RE_RANKING)
    cfg.TEST.TTPT.ENABLED = True
    cfg.TEST.TTPT.STEPS = 2 if ctx.smoke else 4
    cfg.TEST.RE_RANKING = False
    try:
        def run():
            t0 = time.perf_counter()
            do_inference_ttpt(cfg, model, variables, loader, loader.num_query)
            return time.perf_counter() - t0

        dt = benchkit.best_of(run, windows=2)
    finally:
        (cfg.TEST.TTPT.ENABLED, cfg.TEST.TTPT.STEPS,
         cfg.TEST.RE_RANKING) = saved
    return {"ttpt_queries_per_sec": loader.num_query / dt}


@section("uniprompt_pipeline")
def sec_uniprompt_pipeline(ctx):
    """End-to-end Uni-Prompt pipeline wall-clock: ONE orchestrated
    train_uniprompt.py run (synthetic MMMP, 1 epoch per stage, MoE switch
    on, DEVICE_DATASET, final inference with re-ranking) — the single
    artifact proving the whole product runs on silicon, compiles included
    (ref train_uniprompt.py:81-215). ALWAYS an isolated subprocess."""
    import datetime as _dt
    import re
    import shutil
    import tempfile

    sys.path.insert(0, _REPO_ROOT)
    import train_uniprompt as tu
    from mpreid_tpu.data.synthetic import make_mmmp

    smoke = ctx.smoke
    tmp = tempfile.mkdtemp(prefix="bench_uniprompt_")
    data_root = os.path.join(tmp, "mmmp")
    out_dir = os.path.join(tmp, "out")
    make_mmmp(
        data_root, exp_settings=("exp_cctv_ir_cctv_rgb",),
        n_train_ids=3 if smoke else 16,
        n_test_ids=2 if smoke else 4,
        imgs_per_cam=2,
    )
    overrides = [
        "DATASETS.ROOT_DIR", data_root,
        "OUTPUT_DIR", out_dir,
        "MODEL.PRETRAIN_PATH", "",
        "MODEL.PRETRAIN_AUTO", "False",
        "MODEL.MOE.ENABLED", "True",
        "MODEL.MOE.NUM_EXPERTS", "4",
        "MODEL.MOE.TOP_K", "2",
        "MODEL.MOE.MOE_LAYERS", "2",
        "SOLVER.STAGE1A.MAX_EPOCHS", "1",
        "SOLVER.STAGE1A.CHECKPOINT_PERIOD", "5",
        "SOLVER.STAGE1B.MAX_EPOCHS", "1",
        "SOLVER.STAGE1B.CHECKPOINT_PERIOD", "5",
        "SOLVER.STAGE2.MAX_EPOCHS", "1",
        "SOLVER.STAGE2.CHECKPOINT_PERIOD", "5",
        "SOLVER.STAGE2.EVAL_PERIOD", "5",
        "TEST.RE_RANKING", "True",
        "TPU.DEVICE_DATASET", "True",
        "DATALOADER.NUM_WORKERS", "2",
    ]
    if smoke:
        overrides += [
            "MODEL.DEBUG_TINY", "True", "MODEL.DEVICE", "cpu",
            "INPUT.SIZE_TRAIN", "[64,32]", "INPUT.SIZE_TEST", "[64,32]",
            # pytest's conftest exports an 8-virtual-CPU-device XLA flag;
            # without this pin the trainer goes multi-device, bypasses
            # DEVICE_DATASET, and the tiny smoke dataset is smaller than
            # one global batch. The real bench runs on the ONE chip.
            "TPU.MESH_DATA", "1",
        ]
    old_argv = sys.argv
    sys.argv = [
        "train_uniprompt.py",
        "--config_file", os.path.join(_REPO_ROOT, "configs/ours/cctv_ir_cctv_rgb.yml"),
    ] + overrides
    try:
        t0 = time.perf_counter()
        tu.main()
        total = time.perf_counter() - t0
    except BaseException:
        # a failed run must not leak the synthetic tree (the retry logic
        # re-enters this section, accumulating multi-MB dirs in /tmp)
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    finally:
        sys.argv = old_argv

    # per-stage breakdown from the run's own log timestamps
    breakdown = None
    try:
        log_path = os.path.join(
            out_dir, "exp_cctv_ir_cctv_rgb", "train_log.txt"
        )
        stamps = {}
        markers = [
            ("stage1a", "starting Stage 1a"),
            ("stage1b", "starting Stage 1b"),
            ("stage2a", "2a stage"),
            ("stage2b", "2b stage"),
            ("inference", "Enter inferencing"),
        ]
        ts_re = re.compile(r"^(\d{4}-\d{2}-\d{2} [\d:,.]+)")

        def parse(ts):
            ts = ts.replace(",", ".")
            return _dt.datetime.strptime(ts, "%Y-%m-%d %H:%M:%S.%f")

        first_ts = last_ts = None
        with open(log_path) as f:
            for line in f:
                m = ts_re.match(line)
                if m:
                    last_ts = parse(m.group(1))
                    first_ts = first_ts or last_ts
                for key, marker in markers:
                    if marker in line and key not in stamps and last_ts:
                        stamps[key] = last_ts
        if len(stamps) == len(markers) and first_ts and last_ts:
            order = [k for k, _ in markers]
            breakdown = {
                "setup": round(
                    (stamps["stage1a"] - first_ts).total_seconds(), 1
                )
            }
            for a, b in zip(order, order[1:]):
                breakdown[a] = round(
                    (stamps[b] - stamps[a]).total_seconds(), 1
                )
            breakdown["inference"] = round(
                (last_ts - stamps["inference"]).total_seconds(), 1
            )
    except Exception as e:  # noqa: BLE001 — breakdown is best-effort
        print(f"bench pipeline breakdown parse failed: {e}", file=sys.stderr)
    shutil.rmtree(tmp, ignore_errors=True)
    return {
        "uniprompt_pipeline_seconds": total,
        "uniprompt_pipeline_breakdown": breakdown,
    }


# ---------------------------------------------------------------------------
# subprocess isolation
# ---------------------------------------------------------------------------

# Per-section, per-ATTEMPT wall-clock caps (seconds, non-smoke; see
# _section_subprocess retries). msmt: cold compile ~25 min + ~13 min run;
# pipeline: ~19 min cold. A hung attempt burns at most this before the
# fresh-process retry.
_SECTION_TIMEOUTS = {"msmt_rerank": 3600, "uniprompt_pipeline": 2700}


def _section_subprocess(name, smoke, timeout_s=None, attempts=2):
    """Run one section in a fresh process; return its extras dict or None.

    The child probes the backend itself (waiting out a worker restart),
    then runs the section unguarded — an exception there is a nonzero exit
    the parent records as a section failure.

    ``attempts``: the remote worker can crash or the tunnel can drop MID
    section, leaving the child hung on an RPC that never completes (r5
    bench run 2: msmt_rerank sat 25+ min at zero CPU while a concurrent
    probe process saw a healthy device; the identical standalone repro
    then ran clean). A timed-out/failed child is therefore retried once in
    a fresh process — the retry re-probes the backend and reuses whatever
    the first attempt left in the persistent compile cache."""
    import subprocess

    timeout_s = timeout_s or (
        900 if smoke else _SECTION_TIMEOUTS.get(name, 2700))
    argv = [sys.executable, os.path.abspath(__file__), "--section", name]
    if smoke:
        argv.append("--smoke")
    for attempt in range(1, attempts + 1):
        tag = f"attempt {attempt}/{attempts}"
        try:
            r = subprocess.run(argv, capture_output=True, text=True,
                               timeout=timeout_s, cwd=_REPO_ROOT)
        except subprocess.TimeoutExpired:
            print(f"bench section {name!r} (subprocess, {tag}) timed out "
                  f"after {timeout_s:.0f}s", file=sys.stderr)
            continue
        if r.stderr:
            tail = r.stderr.strip().splitlines()[-12:]
            for line in tail:
                print(f"[{name}] {line}", file=sys.stderr)
        payload = None
        for line in r.stdout.splitlines():
            if line.startswith(_SECTION_MARKER):
                try:
                    payload = json.loads(line[len(_SECTION_MARKER):])
                except json.JSONDecodeError:
                    payload = None
        if r.returncode == 0 and payload is not None and not payload.get("error"):
            return payload.get("extras")
        err = (payload or {}).get("error", f"exit {r.returncode}")
        print(f"bench section {name!r} (subprocess, {tag}) failed: {err}",
              file=sys.stderr)
    return None


def run_single_section(name: str, smoke: bool) -> int:
    """``--section`` child entry: one section, one marker-JSON line."""
    import jax

    if name not in SECTIONS:
        print(_SECTION_MARKER + json.dumps(
            {"section": name, "error": f"unknown section {name!r}"}
        ))
        return 2
    if smoke:
        jax.config.update("jax_platforms", "cpu")
    elif not wait_for_backend(max_wait_s=600.0):
        print(_SECTION_MARKER + json.dumps(
            {"section": name, "error": "backend unreachable"}
        ))
        return 3
    if not smoke:
        _enable_compile_cache()
    ctx = BenchCtx(smoke)
    extras = SECTIONS[name](ctx)
    print(_SECTION_MARKER + json.dumps({"section": name, "extras": extras}))
    return 0


# ---------------------------------------------------------------------------
# main orchestration
# ---------------------------------------------------------------------------

def main(smoke: bool = False):
    """Run the bench; print ONE JSON line; return the result dict.

    ``smoke=True`` runs the identical section/guard control flow with tiny
    towers on CPU — a harness-bug tripwire runnable without the TPU
    (tests/test_bench_main.py). Timings from smoke mode are meaningless;
    only the wiring (section ordering, donation threading, HBM frees,
    subprocess isolation, extras assembly) is under test."""
    import jax

    if smoke:
        jax.config.update("jax_platforms", "cpu")
    elif not wait_for_backend():
        # don't touch the backend in-process after the budget: a wedged
        # tunnel HANGS init forever, stalling whatever invoked us. Emit an
        # honest no-measurement line and a nonzero exit instead.
        print(json.dumps({
            "metric": "stage1a_prompt_train_img_per_sec",
            "value": None, "unit": "img/s", "vs_baseline": None,
            "error": "TPU backend unreachable (probe budget exhausted)",
        }))
        raise SystemExit(1)
    if not smoke:
        _enable_compile_cache()

    ctx = BenchCtx(smoke)
    results = {}
    health = {"dead": False}

    def run(name, isolate=False):
        """One section behind the fault barrier. ``isolate=True`` always
        subprocesses; a detected dead backend flips every later section to
        subprocess mode (fresh client) instead of burning them."""
        if isolate or health["dead"]:
            r = _section_subprocess(name, smoke)
            if r is not None:
                results.update(r)
            return
        try:
            results.update(SECTIONS[name](ctx) or {})
        except Exception as e:  # noqa: BLE001 — deliberate fault barrier
            print(f"bench section {name!r} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            if _backend_dead_error(e):
                health["dead"] = True
                print("bench: backend classified DEAD — remaining sections "
                      "run in fresh subprocesses", file=sys.stderr)
                r = _section_subprocess(name, smoke)
                if r is not None:
                    results.update(r)

    # ceiling FIRST: MFU denominators must never depend on the tail
    run("matmul_ceiling")
    run("stage1a")
    run("stage1a_dispatch")
    run("eval_scan")
    run("stage2_dispatch")
    run("stage2_epoch_scan")
    run("stage2_b128")
    run("stage1b")
    run("stage2b_moe")
    run("rn50_eval")
    run("rn50_train")
    run("market_rerank")
    run("tta")
    run("ttpt")
    # the high-risk pair runs LAST and ISOLATED, after the parent frees
    # its device state so each child owns the chip's 16 GB HBM
    ctx.free_device_state()
    run("msmt_rerank", isolate=True)
    run("uniprompt_pipeline", isolate=True)

    result = _assemble(ctx, results, smoke)
    print(json.dumps(result))
    return result


def _assemble(ctx, results, smoke):
    """Raw section results → the recorded artifact (rounding, derived
    TFLOP/s + MFU arithmetic). Must not touch the device."""
    import jax

    def _r(x, n=1):
        return round(x, n) if x is not None else None

    g = results.get
    cfg, model = ctx.cfg_model
    fwd_flops = vit_flops_per_image(model.clip_config, ctx.num_classes)
    rn_flops = g("_rn50_flops")
    img_per_sec = g("_stage1a_img_per_sec")
    matmul = g("matmul_tflops_measured")
    rerank_seconds = g("market_scale_rerank_seconds")

    def tflops(rate, mult=1.0):
        return mult * fwd_flops * rate / 1e12 if rate is not None else None

    stage2_achieved = tflops(g("stage2_train_img_per_sec"), 3.0)
    stage2_b128_achieved = tflops(g("stage2_b128_img_per_sec"), 3.0)
    eval_achieved = tflops(g("gallery_feats_per_sec_per_chip"))
    rn50_eval_tflops = (
        rn_flops * g("rn50_eval_feats_per_sec") / 1e12
        if rn_flops is not None and g("rn50_eval_feats_per_sec") is not None
        else None
    )
    rn50_train_tflops = (
        3.0 * rn_flops * g("rn50_train_img_per_sec") / 1e12
        if rn_flops is not None and g("rn50_train_img_per_sec") is not None
        else None
    )

    def _mfu(tf):
        if tf is None or not matmul:
            return None
        return round(tf / matmul, 3)

    try:
        device = str(jax.devices()[0])
        device_kind = jax.devices()[0].device_kind
    except Exception:  # noqa: BLE001 — backend died; identity is cosmetic
        device, device_kind = "unknown", "unknown"
    peak = None
    for kind, tfl in PEAK_BF16_TFLOPS.items():
        if kind.lower() in device_kind.lower():
            peak = tfl

    extras = {
        "gallery_feats_per_sec_per_chip": _r(g("gallery_feats_per_sec_per_chip")),
        "stage2_train_img_per_sec": _r(g("stage2_train_img_per_sec")),
        "stage2_img_per_sec_per_step_dispatch": _r(
            g("stage2_img_per_sec_per_step_dispatch")),
        "stage2_b128_img_per_sec": _r(g("stage2_b128_img_per_sec")),
        "mfu_stage2_b128_vs_measured_matmul": _mfu(stage2_b128_achieved),
        "stage1b_img_per_sec": _r(g("stage1b_img_per_sec")),
        "stage2b_moe_img_per_sec": _r(g("stage2b_moe_img_per_sec")),
        "rn50_eval_feats_per_sec": _r(g("rn50_eval_feats_per_sec")),
        "rn50_train_img_per_sec": _r(g("rn50_train_img_per_sec")),
        "rn50_fwd_gflops_per_img": _r(
            rn_flops / 1e9 if rn_flops is not None else None, 2
        ),
        "mfu_rn50_eval_vs_measured_matmul": _mfu(rn50_eval_tflops),
        "mfu_rn50_train_vs_measured_matmul": _mfu(rn50_train_tflops),
        "stage1a_sec_per_iter": _r(g("stage1a_sec_per_iter"), 4),
        "stage1a_img_per_sec_per_iter_dispatch": _r(
            g("stage1a_img_per_sec_per_iter_dispatch")),
        "market_scale_rerank_seconds": _r(rerank_seconds, 4 if smoke else 2),
        # caveat IN the key: the reference comparison ran on this host's
        # single CPU core (see CLAUDE.md) — not a parallel-CPU baseline
        "market_scale_rerank_speedup_vs_reference_cpu_1core": _r(
            REFERENCE_RERANK_SECONDS / rerank_seconds
            if rerank_seconds else None
        ),
        # sparse-V path at MSMT17 corpus scale (N≈94k) — impossible for the
        # dense path (35 GB/matrix) AND for the reference's NumPy (same N²)
        "msmt_scale_rerank_seconds": _r(
            g("msmt_scale_rerank_seconds"), 4 if smoke else 1),
        "msmt_rerank_sampled_rows_max_err_vs_exact": _r(
            g("msmt_rerank_sampled_rows_max_err_vs_exact"), 4),
        "msmt_rerank_rank1_delta": _r(g("msmt_rerank_rank1_delta"), 4),
        "msmt_rerank_map_delta_sampled": _r(
            g("msmt_rerank_map_delta_sampled"), 4),
        "msmt_rerank_top1_disagreement": _r(
            g("msmt_rerank_top1_disagreement"), 4),
        "tta_feats_per_sec": _r(g("tta_feats_per_sec")),
        "ttpt_queries_per_sec": _r(g("ttpt_queries_per_sec"), 4 if smoke else 1),
        # end-to-end train_uniprompt.py (4 stages + MoE switch + final
        # inference with re-ranking), compiles included; breakdown from the
        # run's own log timestamps
        "uniprompt_pipeline_seconds": _r(g("uniprompt_pipeline_seconds")),
        "uniprompt_pipeline_breakdown": g("uniprompt_pipeline_breakdown"),
        "model_fwd_gflops_per_img": round(fwd_flops / 1e9, 2),
        "stage2_achieved_tflops": _r(stage2_achieved, 2),
        "eval_achieved_tflops": _r(eval_achieved, 2),
        # smoke runs on CPU where the ceiling is ~0.01-0.05 TF/s — keep
        # enough decimals that the value stays nonzero in the artifact
        "matmul_tflops_measured": _r(matmul, 3 if smoke else 1),
        "mfu_stage2_vs_measured_matmul": _mfu(stage2_achieved),
        "mfu_eval_vs_measured_matmul": _mfu(eval_achieved),
        "peak_bf16_tflops_nominal": peak,
        "mfu_stage2": (round(stage2_achieved / peak, 3)
                       if peak and stage2_achieved is not None else None),
        "mfu_eval": (round(eval_achieved / peak, 3)
                     if peak and eval_achieved is not None else None),
        "device": device,
        "device_kind": device_kind,
    }
    return {
        "metric": "stage1a_prompt_train_img_per_sec",
        "value": _r(img_per_sec),
        "unit": "img/s",
        "vs_baseline": (
            round(img_per_sec / REFERENCE_STAGE1A_IMG_PER_SEC, 3)
            if img_per_sec is not None else None
        ),
        "extras": extras,
    }


if __name__ == "__main__":
    if "--section" in sys.argv:
        _name = sys.argv[sys.argv.index("--section") + 1]
        raise SystemExit(run_single_section(_name, "--smoke" in sys.argv))
    main(smoke="--smoke" in sys.argv)
