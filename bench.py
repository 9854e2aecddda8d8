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


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mpreid_tpu.config import get_default_cfg
    from mpreid_tpu.engine.steps import make_eval_step, make_stage1_step
    from mpreid_tpu.engine.train_state import initial_state
    from mpreid_tpu.models import init_variables, make_model_uniprompt
    from mpreid_tpu.solver import make_optimizer

    cfg = get_default_cfg()
    cfg.MODEL.NAME = "ViT-B-16"
    cfg.INPUT.SIZE_TRAIN = [256, 128]
    cfg.INPUT.SIZE_TEST = [256, 128]
    cfg.SOLVER.STAGE1A.IMS_PER_BATCH = 64

    num_classes = 1000
    batch = 64
    embed_dim = 512

    model = make_model_uniprompt(cfg, num_class=num_classes, camera_num=14, view_num=1)
    variables = init_variables(model, jax.random.PRNGKey(0), cfg)

    # ---- stage-1a prompt-training throughput ----
    # Uses the production epoch path: the whole window runs as ONE compiled
    # scan over the device-resident feature bank (engine.steps.make_stage1_epoch),
    # exactly how do_train_stage1 executes an epoch.
    from mpreid_tpu.engine.steps import make_stage1_epoch

    optimizer = make_optimizer(cfg.SOLVER.STAGE1A, variables["params"], stage="stage1a")
    epoch_fn = make_stage1_epoch(model, cfg, optimizer, stage="1a")
    # steps donate their input state — build each benchmark state from a copy
    fresh = lambda: jax.tree_util.tree_map(jnp.array, variables)
    state = initial_state(fresh(), optimizer)

    iters = 50  # the reference's measured window is 50 iters
    rng = np.random.RandomState(0)
    bank = jnp.asarray(rng.randn(iters * batch, embed_dim).astype(np.float32))
    bank_labels = jnp.asarray(
        rng.randint(0, num_classes, iters * batch).astype(np.int32)
    )
    bank_views = jnp.zeros(iters * batch, jnp.int32)
    perm = jnp.arange(iters * batch).reshape(iters, batch)

    # warmup / compile. NOTE: under the remote TPU runtime block_until_ready
    # on a scalar does not reliably synchronize — fetch values instead.
    # epoch_fn donates its input state; thread it through.
    state, losses = epoch_fn(state, bank, bank_labels, bank_views, perm, 3.5e-4)
    _ = float(jnp.sum(losses))

    # two timed windows, best-of (remote-tunnel latency varies run to run)
    dts = []
    for _ in range(2):
        t0 = time.perf_counter()
        state, losses = epoch_fn(state, bank, bank_labels, bank_views, perm, 3.5e-4)
        _ = float(jnp.sum(losses))
        _ = float(jnp.sum(jax.tree_util.tree_leaves(state.params)[0]))
        dts.append(time.perf_counter() - t0)
    dt = min(dts)
    img_per_sec = iters * batch / dt

    # ---- stage-1a per-iter dispatch throughput ----
    # Same workload, but one host dispatch per optimizer step instead of the
    # compiled epoch scan — so the headline scan number can't be attributed
    # to epoch batching alone. Steps are dispatched back-to-back (async) with
    # one result fetch at the end; per-iter host syncs would measure the
    # remote tunnel's RTT, not the chip.
    step1 = make_stage1_step(model, cfg, optimizer, stage="1a")
    state1i = initial_state(fresh(), optimizer)
    views64 = jnp.zeros(batch, jnp.int32)
    state1i, m1 = step1(state1i, bank[:batch], bank_labels[:batch], views64, 3.5e-4)
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
    stage1a_periter_img_per_sec = iters * batch / min(iter_dts)

    # ---- gallery feature extraction throughput (eval forward, bf16) ----
    # The whole timed loop runs inside ONE jitted lax.scan with a data
    # dependency between iterations — immune to host dispatch latency,
    # request caching, or overlap in the remote runtime.
    from mpreid_tpu.ops.augment import eval_preprocess

    eval_iters = 20
    images = jnp.asarray(rng.randint(0, 255, (batch, 256, 128, 3), dtype=np.uint8))

    import functools

    @functools.partial(jax.jit, static_argnames=("iters",))
    def eval_bench(params, batch_stats, images_u8, iters):
        def body(carry, _):
            x = eval_preprocess(
                images_u8 + carry,
                mean=tuple(cfg.INPUT.PIXEL_MEAN), std=tuple(cfg.INPUT.PIXEL_STD),
            )
            f = model.apply(
                {"params": params, "batch_stats": batch_stats}, x, train=False
            )
            # depend on EVERY output element so XLA cannot slice the batch away
            s = jnp.sum(f.astype(jnp.float32))
            return (s > 1e30).astype(jnp.uint8), s
        carry, sums = jax.lax.scan(body, jnp.zeros((), jnp.uint8), None, length=iters)
        return jnp.sum(sums)

    _ = float(eval_bench(state.params, state.batch_stats, images, eval_iters))
    eval_dts = []
    for _ in range(2):
        t0 = time.perf_counter()
        _ = float(eval_bench(state.params, state.batch_stats, images, eval_iters))
        eval_dts.append(time.perf_counter() - t0)
    eval_dt = min(eval_dts)
    feats_per_sec = eval_iters * batch / eval_dt

    # ---- stage-2 fine-tune throughput (full ViT fwd+bwd + losses + Adam) ----
    from mpreid_tpu.engine.steps import make_train_step
    from mpreid_tpu.losses import make_loss

    cfg.DATALOADER.SAMPLER = "softmax_triplet"
    cfg.MODEL.ID_LOSS_WEIGHT = 0.25
    loss_fn, _unused = make_loss(cfg, num_classes)
    opt2 = make_optimizer(cfg.SOLVER.STAGE2, variables["params"], stage="stage2a")
    text_features = jnp.asarray(rng.randn(num_classes, embed_dim).astype(np.float32))
    step2 = make_train_step(
        model, cfg, loss_fn, opt2, uniprompt=True, text_features=text_features
    )
    state2 = initial_state(fresh(), opt2)
    train_batch = {
        "images": jnp.asarray(rng.randint(0, 255, (batch, 256, 128, 3), dtype=np.uint8)),
        "pids": jnp.asarray((np.arange(batch) // 4 % num_classes).astype(np.int32)),
        "camids": jnp.zeros(batch, jnp.int32),
        "trackids": jnp.zeros(batch, jnp.int32),
    }
    key = jax.random.PRNGKey(0)
    state2, m2 = step2(state2, train_batch, 5e-6, key)
    _ = float(m2["loss"])
    s2_iters = 20
    s2_dts = []
    for _ in range(2):
        t0 = time.perf_counter()
        for _i in range(s2_iters):
            state2, m2 = step2(state2, train_batch, 5e-6, key)
        _ = float(m2["loss"])
        _ = float(jnp.sum(jax.tree_util.tree_leaves(state2.params)[0]))
        s2_dts.append(time.perf_counter() - t0)
    s2_dt = min(s2_dts)
    stage2_img_per_sec = s2_iters * batch / s2_dt

    # ---- Market-scale k-reciprocal re-ranking wall-clock ----
    from mpreid_tpu.ops.reranking import re_ranking

    Q, G, D = 3368, 15913, 512
    n_ids = 750
    centers = rng.randn(n_ids, D).astype(np.float32)
    qf = jnp.asarray(
        (centers[rng.randint(0, n_ids, Q)] + rng.randn(Q, D) * 0.7).astype(np.float32)
    )
    gf = jnp.asarray(
        (centers[rng.randint(0, n_ids, G)] + rng.randn(G, D) * 0.7).astype(np.float32)
    )
    d = re_ranking(qf, gf, k1=50, k2=15, fast_minsum=True)
    _ = float(jnp.sum(d))  # compile + run
    rr_dts = []
    for _ in range(2):
        t0 = time.perf_counter()
        d = re_ranking(qf, gf, k1=50, k2=15, fast_minsum=True)
        _ = float(jnp.sum(d))
        rr_dts.append(time.perf_counter() - t0)
    rerank_seconds = min(rr_dts)

    # ---- MFU: analytic model FLOPs vs the silicon ----
    fwd_flops = vit_flops_per_image(model.clip_config, num_classes)
    stage2_achieved_tflops = 3.0 * fwd_flops * stage2_img_per_sec / 1e12
    eval_achieved_tflops = fwd_flops * feats_per_sec / 1e12
    matmul_ceiling_tflops = measure_matmul_ceiling_tflops()
    device_kind = jax.devices()[0].device_kind
    peak = None
    for kind, tflops in PEAK_BF16_TFLOPS.items():
        if kind.lower() in device_kind.lower():
            peak = tflops

    extras = {
        "gallery_feats_per_sec_per_chip": round(feats_per_sec, 1),
        "stage2_train_img_per_sec": round(stage2_img_per_sec, 1),
        "stage1a_sec_per_iter": round(dt / iters, 4),
        "stage1a_img_per_sec_per_iter_dispatch": round(
            stage1a_periter_img_per_sec, 1
        ),
        "market_scale_rerank_seconds": round(rerank_seconds, 2),
        "market_scale_rerank_speedup_vs_reference_cpu": round(
            REFERENCE_RERANK_SECONDS / rerank_seconds, 1
        ),
        "model_fwd_gflops_per_img": round(fwd_flops / 1e9, 2),
        "stage2_achieved_tflops": round(stage2_achieved_tflops, 2),
        "eval_achieved_tflops": round(eval_achieved_tflops, 2),
        "matmul_tflops_measured": round(matmul_ceiling_tflops, 1),
        "mfu_stage2_vs_measured_matmul": round(
            stage2_achieved_tflops / matmul_ceiling_tflops, 3
        ),
        "mfu_eval_vs_measured_matmul": round(
            eval_achieved_tflops / matmul_ceiling_tflops, 3
        ),
        "peak_bf16_tflops_nominal": peak,
        "mfu_stage2": round(stage2_achieved_tflops / peak, 3) if peak else None,
        "mfu_eval": round(eval_achieved_tflops / peak, 3) if peak else None,
        "device": str(jax.devices()[0]),
        "device_kind": device_kind,
    }
    print(json.dumps({
        "metric": "stage1a_prompt_train_img_per_sec",
        "value": round(img_per_sec, 1),
        "unit": "img/s",
        "vs_baseline": round(img_per_sec / REFERENCE_STAGE1A_IMG_PER_SEC, 3),
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
