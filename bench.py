"""Benchmark harness — runs on the real TPU chip.

Primary metric: stage-1a prompt-training throughput (images/sec), directly
comparable to the reference's only measurable number — ≈945 img/s on an
unnamed CUDA GPU (50 iters × batch 64 in ≈3.4 s; reference
``test_output_wizMandD/exp_cctv_ir_cctv_rgb/train_log.txt:299-303``, loop at
``processor/processor_uniprompt_stage1.py:66-107``). The workload is
identical: batch-64 prompt-context training steps (text-encoder fwd+bwd +
SupCon i2t/t2i) against a precomputed image-feature bank, ViT-B/16 CLIP
scale, 1000 identities.

Also measures gallery feature-extraction throughput (feats/sec/chip,
BASELINE.json north-star) and reports it in "extras".

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import time


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
    import sys

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


def main(smoke: bool = False):
    """Run the bench; print ONE JSON line; return the result dict.

    ``smoke=True`` runs the identical section/guard control flow with tiny
    towers on CPU — a harness-bug tripwire runnable without the TPU
    (tests/test_bench_main.py). Timings from smoke mode are meaningless;
    only the wiring (section ordering, donation threading, HBM frees,
    extras assembly) is under test."""
    import sys

    import jax
    import jax.numpy as jnp
    import numpy as np

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

    def _guard(name, fn, default=None):
        """Run one extras section; on failure report to stderr and keep
        going — a transient tunnel/compile failure in a secondary section
        must not cost the headline metric (extras key becomes null)."""
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — deliberate fault barrier
            print(f"bench section {name!r} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            return default

    def _r(x, n=1):
        return round(x, n) if x is not None else None

    from mpreid_tpu.engine.steps import make_stage1_step
    from mpreid_tpu.engine.train_state import initial_state
    from mpreid_tpu.utils import benchkit

    num_classes = 12 if smoke else 1000
    batch = 8 if smoke else 64
    img_size = (64, 32) if smoke else (256, 128)

    # All measured programs come from mpreid_tpu.utils.benchkit — the single
    # source of truth shared with the tools/ A/B scripts and the profiler,
    # so every recorded number is a measurement of the identical graph.
    cfg, model, variables = benchkit.uniprompt_env(
        num_classes=num_classes, size=img_size, debug_tiny=smoke,
    )
    embed_dim = model.clip_config.embed_dim  # 512 on the real ViT-B/16
    cfg.SOLVER.STAGE1A.IMS_PER_BATCH = batch
    # steps donate their input state — build each benchmark state from a copy
    fresh = lambda: jax.tree_util.tree_map(jnp.array, variables)
    rng = np.random.RandomState(0)

    # ---- stage-1a prompt-training throughput ----
    # Production epoch path: the whole window runs as ONE compiled scan over
    # the device-resident feature bank (engine.steps.make_stage1_epoch),
    # exactly how do_train_stage1 executes an epoch. 50-iter window = the
    # reference's measured window. Two timed windows, best-of (remote-tunnel
    # latency varies run to run); results fetched — block_until_ready on a
    # scalar does not synchronize under the remote runtime.
    iters = 3 if smoke else 50
    h1a = benchkit.stage1_harness(
        cfg, model, variables, stage="1a", iters=iters, batch=batch,
        num_classes=num_classes, embed_dim=embed_dim,
    )
    dt = benchkit.best_of(benchkit.epoch_window(h1a), windows=2)
    img_per_sec = iters * batch / dt
    state = h1a["state"]  # post-training state: params reused by eval below
    optimizer, bank, bank_labels = h1a["opt"], h1a["bank"], h1a["labels"]

    # ---- stage-1a per-iter dispatch throughput ----
    # Same workload, but one host dispatch per optimizer step instead of the
    # compiled epoch scan — so the headline scan number can't be attributed
    # to epoch batching alone. Steps are dispatched back-to-back (async) with
    # one result fetch at the end; per-iter host syncs would measure the
    # remote tunnel's RTT, not the chip.
    def _sec_stage1a_periter():
        step1 = make_stage1_step(model, cfg, optimizer, stage="1a")
        state1i = initial_state(fresh(), optimizer)
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
        return iters * batch / min(iter_dts)

    stage1a_periter_img_per_sec = _guard(
        "stage1a_periter", _sec_stage1a_periter
    )

    # ---- gallery feature extraction throughput (eval forward, bf16) ----
    # ONE jitted lax.scan per window with a data dependency between
    # iterations — immune to host dispatch latency, request caching, or
    # overlap in the remote runtime (benchkit.make_eval_scan). Batch 128 /
    # 40 iters: the measured v5e optimum; the window amortizes the ~20 ms
    # tunnel fetch to <0.3%.
    eval_iters = 2 if smoke else 40
    eval_batch = 8 if smoke else 128

    def _sec_eval():
        eval_run = benchkit.make_eval_scan(
            cfg, model, state.params, state.batch_stats,
            batch=eval_batch, iters=eval_iters,
        )
        eval_dt = benchkit.best_of(benchkit.timed(eval_run), windows=2)
        return eval_iters * eval_batch / eval_dt

    feats_per_sec = _guard("eval_scan", _sec_eval)

    # ---- stage-2 fine-tune throughput (full ViT fwd+bwd + losses + Adam) ----
    from mpreid_tpu.engine.steps import make_train_step
    from mpreid_tpu.solver import make_optimizer

    s2_iters = 2 if smoke else 20
    h2 = benchkit.stage2_harness(
        cfg, model, variables, num_classes=num_classes, batch=batch,
        embed_dim=embed_dim,
    )
    loss_fn, opt2, text_features = h2["loss_fn"], h2["opt"], h2["text_features"]
    train_batch, key = h2["batch"], h2["key"]

    def _sec_stage2_periter():
        s2_dt = benchkit.best_of(
            benchkit.step_window(h2, iters=s2_iters), windows=2
        )
        return s2_iters * batch / s2_dt

    stage2_periter_img_per_sec = _guard("stage2_periter", _sec_stage2_periter)
    h2["state"] = None  # free HBM before the epoch-scan state

    # Production stage-2 path on this host (TPU.DEVICE_DATASET, see
    # CLAUDE.md): the whole epoch is ONE compiled scan over device-resident
    # images — no per-step host dispatch. This is the headline stage-2
    # number; the per-step-dispatch figure above is reported alongside.
    #
    # Scan length: a real Market-scale stage-2 epoch is ~186 iterations; a
    # 20-iter scan under-reports production throughput because the per-epoch
    # constants (2 tunnel result fetches at ~20-40 ms each, partition/merge,
    # dispatch) don't amortize. The xplane profile (tools/profile_stage2.py
    # --epoch, r4) shows the scan BODY at ~34.2 ms/iter device — equal to
    # the bare step, zero carry overhead — so we scan 100 iters (the
    # permutation tiled over the same device-resident images, as a PK
    # sampler revisits images across epochs) to measure the amortized rate.
    from mpreid_tpu.engine.steps import make_train_epoch

    def _sec_stage2_epoch():
        epoch2 = make_train_epoch(
            model, cfg, loss_fn, opt2, uniprompt=True, text_features=text_features
        )
        n_data = s2_iters * batch
        scan_iters = 5 * s2_iters  # 100 on the real run, 10 in smoke
        th, tw = cfg.INPUT.SIZE_TRAIN
        ds_images = jnp.asarray(
            rng.randint(0, 255, (n_data, th, tw, 3), dtype=np.uint8)
        )
        ds_pids = jnp.asarray((np.arange(n_data) // 4 % num_classes).astype(np.int32))
        ds_zeros = jnp.zeros(n_data, jnp.int32)
        perm2 = jnp.tile(jnp.arange(n_data), 5).reshape(scan_iters, batch)
        h2e = {"state": initial_state(fresh(), opt2)}

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
        return scan_iters * batch / s2e_dt

    # no fallback default: a failed epoch-scan section must record null, not
    # the per-step-dispatch program's number under the epoch-scan keys
    stage2_img_per_sec = _guard("stage2_epoch_scan", _sec_stage2_epoch)

    # Stage-2 at batch 128: the Adam update's HBM traffic (~4.7 ms for the
    # 87M trainable params, batch-independent) amortizes over 2× the images
    # and the larger matmuls tile the MXU better. Batch 64 above is the
    # reference's config (the parity point); this is the tuned production
    # batch for throughput-bound runs.
    b128 = 2 * batch  # 128 on the real run
    def _sec_stage2_b128():
        h2l = benchkit.stage2_harness(
            cfg, model, variables, num_classes=num_classes, batch=b128,
            embed_dim=embed_dim,
        )
        dtl = benchkit.best_of(
            benchkit.step_window(h2l, iters=s2_iters), windows=2
        )
        h2l["state"] = None  # free HBM
        return s2_iters * b128 / dtl

    stage2_b128_img_per_sec = _guard("stage2_b128", _sec_stage2_b128)

    # ---- stage-1b prompt-training throughput (view-conditioned contexts) ----
    # Identical loop shape to 1a but training the modality/platform contexts
    # with real view labels (ref train_uniprompt.py:102-122).
    def _sec_stage1b():
        h1b = benchkit.stage1_harness(
            cfg, model, variables, stage="1b", iters=iters, batch=batch,
            num_classes=num_classes, embed_dim=embed_dim, random_views=True,
        )
        dt1b = benchkit.best_of(benchkit.epoch_window(h1b), windows=2)
        return iters * batch / dt1b

    stage1b_img_per_sec = _guard("stage1b", _sec_stage1b)

    # ---- stage-2b fine-tune throughput (MoE tower, gate+encoder training) ----
    # Exercises the upcycled MoE vision tower (4 experts, top-2, 2 MoE
    # layers) under the stage-2b freeze regime (ref train_uniprompt.py:187-208,
    # make_optimizer_prompt.py:111-152) — the only phase the round-2 bench
    # never timed, and the only perf datapoint for the MoE path.
    from mpreid_tpu.models import switch_to_moe

    def _sec_stage2b():
        moe_saved = {
            k: getattr(cfg.MODEL.MOE, k)
            for k in ("ENABLED", "NUM_EXPERTS", "TOP_K", "MOE_LAYERS")
        }
        cfg.MODEL.MOE.ENABLED = True
        cfg.MODEL.MOE.NUM_EXPERTS = 4
        cfg.MODEL.MOE.TOP_K = 2
        cfg.MODEL.MOE.MOE_LAYERS = 2
        try:
            moe_model, moe_vars = switch_to_moe(cfg, model, variables)
            opt2b = make_optimizer(cfg.SOLVER.STAGE2, moe_vars["params"],
                                   stage="stage2b")
            step2b = make_train_step(
                moe_model, cfg, loss_fn, opt2b, uniprompt=True,
                text_features=text_features,
            )
            h2b = {
                "step": step2b,
                "state": initial_state(
                    jax.tree_util.tree_map(jnp.array, moe_vars), opt2b
                ),
                "batch": train_batch, "key": key,
            }
            dt2b = benchkit.best_of(
                benchkit.step_window(h2b, iters=s2_iters), windows=2
            )
            return s2_iters * batch / dt2b
        finally:
            for k, v in moe_saved.items():
                setattr(cfg.MODEL.MOE, k, v)

    stage2b_img_per_sec = _guard("stage2b_moe", _sec_stage2b)

    # ---- RN50 path: eval + train throughput (ref configs/person/cnn_base.yml) ----
    # eval and train get SEPARATE fault barriers (sharing one env): a tunnel
    # blip during the train half must not discard a completed eval window.
    rn50_env = _guard("rn50_env", lambda: benchkit.rn50_env(
        num_classes=num_classes, size=img_size, debug_tiny=smoke,
    ))
    rn50_feats_per_sec = rn50_train_img_per_sec = rn_flops = None
    if rn50_env is not None:
        cfg_rn, rn_model, rn_vars = rn50_env
        rn_flops = rn50_flops_per_image(
            rn_model.clip_config, rn_model.in_planes, num_classes
        )

        def _sec_rn50_eval():
            rn_eval = benchkit.make_eval_scan(
                cfg_rn, rn_model, rn_vars["params"], rn_vars["batch_stats"],
                batch=eval_batch, iters=eval_iters,
            )
            rn_eval_dt = benchkit.best_of(benchkit.timed(rn_eval), windows=2)
            return eval_iters * eval_batch / rn_eval_dt

        rn50_feats_per_sec = _guard("rn50_eval", _sec_rn50_eval)

        def _sec_rn50_train():
            hrn = benchkit.baseline_harness(
                cfg_rn, rn_model, rn_vars, num_classes=num_classes, batch=batch
            )
            rn_dt = benchkit.best_of(
                benchkit.step_window(hrn, iters=s2_iters), windows=2
            )
            return s2_iters * batch / rn_dt

        rn50_train_img_per_sec = _guard("rn50_train", _sec_rn50_train)

    # ---- Market-scale k-reciprocal re-ranking wall-clock ----
    from mpreid_tpu.ops.reranking import re_ranking

    def _sec_rerank():
        Q, G, D = (40, 200, 32) if smoke else (3368, 15913, 512)
        n_ids = 10 if smoke else 750
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
        return min(rr_dts)

    rerank_seconds = _guard("rerank", _sec_rerank)

    # ---- MSMT17-scale re-ranking (sparse-V path, beyond dense HBM) ----
    # N≈94k: the dense path needs several 35 GB matrices and cannot run on
    # a 16 GB chip; the sparse path (ops/reranking_sparse.py) holds O(N·W).
    # Quantized MXU min-sum for the full (Q, G) matrix, then 3 sampled query
    # rows recomputed with the EXACT sparse min-sum as the on-chip oracle
    # (the NumPy oracle is O(N²) memory and cannot run at this scale either).
    from mpreid_tpu.ops.reranking_sparse import (
        re_ranking_sparse, re_ranking_sparse_rows,
    )

    def _sec_msmt_rerank():
        Q, G, D = (24, 100, 16) if smoke else (11659, 82161, 512)
        n_ids = 8 if smoke else 3000
        kw = dict(k1=50, k2=15)
        if smoke:
            kw = dict(k1=10, k2=4, block=32, g_chunk=32)
        centers = rng.randn(n_ids, D).astype(np.float32)
        qf = jnp.asarray(
            (centers[rng.randint(0, n_ids, Q)]
             + rng.randn(Q, D) * 0.7).astype(np.float32)
        )
        gf = jnp.asarray(
            (centers[rng.randint(0, n_ids, G)]
             + rng.randn(G, D) * 0.7).astype(np.float32)
        )
        d = re_ranking_sparse(qf, gf, minsum="quantized", **kw)
        _ = float(jnp.sum(d))  # compile + run
        t0 = time.perf_counter()
        d = re_ranking_sparse(qf, gf, minsum="quantized", **kw)
        _ = float(jnp.sum(d))  # one timed window: a full run is minutes
        dt = time.perf_counter() - t0
        rows = np.asarray([0, Q // 2, Q - 1], np.int32)
        d_rows = np.asarray(d[jnp.asarray(rows)])
        del d  # free the (Q, G) matrix before the oracle's construction
        exact_rows = np.asarray(re_ranking_sparse_rows(
            qf, gf, jnp.asarray(rows), **kw
        ))
        err = float(np.max(np.abs(d_rows - exact_rows)))
        return dt, err

    msmt = _guard("msmt_rerank", _sec_msmt_rerank)
    msmt_rerank_seconds, msmt_rerank_err = msmt if msmt else (None, None)

    # ---- TTA / TTPT eval modes (the reference's most expensive eval path,
    # ref processor_uniprompt_stage2.py:269-693 — never TPU-timed before r4)
    def _sec_tta():
        tta_run = benchkit.make_tta_scan(
            cfg, model, state.params, state.batch_stats,
            batch=eval_batch, iters=max(2, eval_iters // 4),
        )
        dt = benchkit.best_of(benchkit.timed(tta_run), windows=2)
        return max(2, eval_iters // 4) * eval_batch / dt

    tta_feats_per_sec = _guard("tta_scan", _sec_tta)

    def _sec_ttpt():
        # per-query-batch prompt tuning: STEPS entropy-min AdamW updates on
        # ctx_generic, each step a full text-tower fwd+bwd over all classes
        # (engine/ttpt.py::_make_ttpt_tuner; STEPS=4 per VERDICT task #6)
        from mpreid_tpu.engine.ttpt import _make_ttpt_tuner

        saved_steps = cfg.TEST.TTPT.STEPS
        cfg.TEST.TTPT.STEPS = 2 if smoke else 4
        try:
            tuner = _make_ttpt_tuner(model, cfg, num_classes)
            qb = eval_batch
            agg = rng.randn(qb, embed_dim).astype(np.float32)
            agg = jnp.asarray(agg / np.linalg.norm(agg, axis=1, keepdims=True))
            tf, ent = tuner(state.params, state.batch_stats, agg)
            _ = float(jnp.sum(tf))  # compile
            dts = []
            for _ in range(2):
                t0 = time.perf_counter()
                # data dependency between calls — the remote runtime must
                # not dedupe/cache identical executions
                tf, ent = tuner(
                    state.params, state.batch_stats,
                    agg + 1e-6 * jnp.mean(tf),
                )
                _ = float(jnp.sum(tf)) + float(jnp.sum(ent))
                dts.append(time.perf_counter() - t0)
            return qb / min(dts)
        finally:
            cfg.TEST.TTPT.STEPS = saved_steps

    ttpt_queries_per_sec = _guard("ttpt_tuner", _sec_ttpt)

    # ---- end-to-end Uni-Prompt pipeline wall-clock ----
    # ONE orchestrated train_uniprompt.py run (synthetic MMMP, 1 epoch per
    # stage, MoE switch on, DEVICE_DATASET, final inference with
    # re-ranking) — the single artifact proving the whole product runs on
    # silicon, compiles included (ref train_uniprompt.py:81-215). Runs
    # LAST: the big bench states are freed first so the pipeline owns HBM.
    fwd_flops = vit_flops_per_image(model.clip_config, num_classes)
    del h1a, h2, bank, bank_labels, optimizer, fresh
    state = None
    variables = None

    def _sec_pipeline():
        import os
        import re
        import shutil
        import tempfile

        import train_uniprompt as tu
        from mpreid_tpu.data.synthetic import make_mmmp

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
            ]
        old_argv = sys.argv
        sys.argv = [
            "train_uniprompt.py",
            "--config_file", "configs/ours/cctv_ir_cctv_rgb.yml",
        ] + overrides
        try:
            t0 = time.perf_counter()
            tu.main()
            total = time.perf_counter() - t0
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
            import datetime as _dt

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
            print(f"bench pipeline breakdown parse failed: {e}",
                  file=sys.stderr)
        shutil.rmtree(tmp, ignore_errors=True)
        return total, breakdown

    pipe = _guard("uniprompt_pipeline", _sec_pipeline)
    pipeline_seconds, pipeline_breakdown = pipe if pipe else (None, None)
    stage2_achieved_tflops = (
        3.0 * fwd_flops * stage2_img_per_sec / 1e12
        if stage2_img_per_sec is not None else None
    )
    stage2_b128_achieved_tflops = (
        3.0 * fwd_flops * stage2_b128_img_per_sec / 1e12
        if stage2_b128_img_per_sec is not None else None
    )
    eval_achieved_tflops = (fwd_flops * feats_per_sec / 1e12
                            if feats_per_sec is not None else None)
    # each half has its own fault barrier — either throughput can be None
    # independently of rn_flops
    rn50_eval_tflops = (
        rn_flops * rn50_feats_per_sec / 1e12
        if rn_flops is not None and rn50_feats_per_sec is not None else None
    )
    rn50_train_tflops = (
        3.0 * rn_flops * rn50_train_img_per_sec / 1e12
        if rn_flops is not None and rn50_train_img_per_sec is not None else None
    )
    matmul_ceiling_tflops = _guard(
        "matmul_ceiling",
        lambda: measure_matmul_ceiling_tflops(
            iters=4, size=256
        ) if smoke else measure_matmul_ceiling_tflops(),
    )
    device_kind = jax.devices()[0].device_kind
    peak = None
    for kind, tflops in PEAK_BF16_TFLOPS.items():
        if kind.lower() in device_kind.lower():
            peak = tflops

    def _mfu(tf):
        if tf is None or not matmul_ceiling_tflops:
            return None
        return round(tf / matmul_ceiling_tflops, 3)

    extras = {
        "gallery_feats_per_sec_per_chip": _r(feats_per_sec),
        "stage2_train_img_per_sec": _r(stage2_img_per_sec),
        "stage2_img_per_sec_per_step_dispatch": _r(stage2_periter_img_per_sec),
        "stage2_b128_img_per_sec": _r(stage2_b128_img_per_sec),
        "mfu_stage2_b128_vs_measured_matmul": _mfu(stage2_b128_achieved_tflops),
        "stage1b_img_per_sec": _r(stage1b_img_per_sec),
        "stage2b_moe_img_per_sec": _r(stage2b_img_per_sec),
        "rn50_eval_feats_per_sec": _r(rn50_feats_per_sec),
        "rn50_train_img_per_sec": _r(rn50_train_img_per_sec),
        "rn50_fwd_gflops_per_img": _r(
            rn_flops / 1e9 if rn_flops is not None else None, 2
        ),
        "mfu_rn50_eval_vs_measured_matmul": _mfu(rn50_eval_tflops),
        "mfu_rn50_train_vs_measured_matmul": _mfu(rn50_train_tflops),
        "stage1a_sec_per_iter": round(dt / iters, 4),
        "stage1a_img_per_sec_per_iter_dispatch": _r(stage1a_periter_img_per_sec),
        "market_scale_rerank_seconds": _r(rerank_seconds, 4 if smoke else 2),
        # caveat IN the key: the reference comparison ran on this host's
        # single CPU core (see CLAUDE.md) — not a parallel-CPU baseline
        "market_scale_rerank_speedup_vs_reference_cpu_1core": _r(
            REFERENCE_RERANK_SECONDS / rerank_seconds
            if rerank_seconds else None
        ),
        # sparse-V path at MSMT17 corpus scale (N≈94k) — impossible for the
        # dense path (35 GB/matrix) AND for the reference's NumPy (same N²)
        "msmt_scale_rerank_seconds": _r(msmt_rerank_seconds, 4 if smoke else 1),
        "msmt_rerank_sampled_rows_max_err_vs_exact": _r(
            msmt_rerank_err, 4
        ),
        "tta_feats_per_sec": _r(tta_feats_per_sec),
        "ttpt_queries_per_sec": _r(ttpt_queries_per_sec, 4 if smoke else 1),
        # end-to-end train_uniprompt.py (4 stages + MoE switch + final
        # inference with re-ranking), compiles included; breakdown from the
        # run's own log timestamps
        "uniprompt_pipeline_seconds": _r(pipeline_seconds),
        "uniprompt_pipeline_breakdown": pipeline_breakdown,
        "model_fwd_gflops_per_img": round(fwd_flops / 1e9, 2),
        "stage2_achieved_tflops": _r(stage2_achieved_tflops, 2),
        "eval_achieved_tflops": _r(eval_achieved_tflops, 2),
        # smoke runs on CPU where the ceiling is ~0.01-0.05 TF/s — keep
        # enough decimals that the value stays nonzero in the artifact
        "matmul_tflops_measured": _r(matmul_ceiling_tflops, 3 if smoke else 1),
        "mfu_stage2_vs_measured_matmul": _mfu(stage2_achieved_tflops),
        "mfu_eval_vs_measured_matmul": _mfu(eval_achieved_tflops),
        "peak_bf16_tflops_nominal": peak,
        "mfu_stage2": (round(stage2_achieved_tflops / peak, 3)
                       if peak and stage2_achieved_tflops is not None else None),
        "mfu_eval": (round(eval_achieved_tflops / peak, 3)
                     if peak and eval_achieved_tflops is not None else None),
        "device": str(jax.devices()[0]),
        "device_kind": device_kind,
    }
    result = {
        "metric": "stage1a_prompt_train_img_per_sec",
        "value": round(img_per_sec, 1),
        "unit": "img/s",
        "vs_baseline": round(img_per_sec / REFERENCE_STAGE1A_IMG_PER_SEC, 3),
        "extras": extras,
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
