"""A/B the attention layout + policy inside the real stage-1a/2a steps.

Stage-1a is text-tower-only → sweeps TEXT_LAYOUT ('hm'/'hm_native'; the
masked-policy rows 'pallas'/'xla' kept for re-verification). Stage-2a is
vision-tower-dominated → sweeps MODEL_LAYOUT ('packed'/'hm'/'hm_native').
Each config re-traces the jitted step fresh (layout globals are read at
trace time). NOTE: for the *_native rows the randomly-initialized params are
simply reinterpreted as head-major — numerics differ from packed but the
compute graph (what we time) is the layout's real graph.

Prints img/s per config. Usage: python tools/bench_stages_ab.py [stage1|stage2|both]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mpreid_tpu.ops import attention as attn  # noqa: E402


def set_config(vision_layout, text_layout, masked_policy):
    attn.MODEL_LAYOUT = vision_layout
    attn.TEXT_LAYOUT = text_layout
    # monkeypatch the auto policy by wrapping force resolution
    attn._MASKED_POLICY = masked_policy


def patch_policy():
    """Make the auto policy read attn._MASKED_POLICY."""
    orig_hm, orig_packed = attn.fused_attention_hm, attn.fused_attention

    def hm(qkv, num_heads, mask=None, force=None):
        if force is None and mask is not None:
            force = getattr(attn, "_MASKED_POLICY", "xla")
        return orig_hm(qkv, num_heads, mask, force)

    def packed(qkv, num_heads, mask=None, force=None):
        if force is None and mask is not None:
            force = getattr(attn, "_MASKED_POLICY", "xla")
        return orig_packed(qkv, num_heads, mask, force)

    attn.fused_attention_hm = hm
    attn.fused_attention = packed


def build():
    from mpreid_tpu.config import get_default_cfg
    from mpreid_tpu.models import init_variables, make_model_uniprompt

    cfg = get_default_cfg()
    cfg.MODEL.NAME = "ViT-B-16"
    cfg.INPUT.SIZE_TRAIN = [256, 128]
    cfg.INPUT.SIZE_TEST = [256, 128]
    cfg.DATALOADER.SAMPLER = "softmax_triplet"
    cfg.MODEL.ID_LOSS_WEIGHT = 0.25
    model = make_model_uniprompt(cfg, num_class=1000, camera_num=14, view_num=1)
    variables = init_variables(model, jax.random.PRNGKey(0), cfg)
    return cfg, model, variables


def bench_stage1(cfg, model, variables):
    from mpreid_tpu.engine.steps import make_stage1_epoch
    from mpreid_tpu.engine.train_state import initial_state
    from mpreid_tpu.solver import make_optimizer

    batch, iters = 64, 50
    opt = make_optimizer(cfg.SOLVER.STAGE1A, variables["params"], stage="stage1a")
    epoch_fn = make_stage1_epoch(model, cfg, opt, stage="1a")
    state = initial_state(jax.tree_util.tree_map(jnp.array, variables), opt)
    rng = np.random.RandomState(0)
    bank = jnp.asarray(rng.randn(iters * batch, 512).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 1000, iters * batch).astype(np.int32))
    views = jnp.zeros(iters * batch, jnp.int32)
    perm = jnp.arange(iters * batch).reshape(iters, batch)
    state, losses = epoch_fn(state, bank, labels, views, perm, 3.5e-4)
    _ = float(jnp.sum(losses))
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, losses = epoch_fn(state, bank, labels, views, perm, 3.5e-4)
        _ = float(jnp.sum(losses))
        _ = float(jnp.sum(jax.tree_util.tree_leaves(state.params)[0]))
        dts.append(time.perf_counter() - t0)
    return iters * batch / min(dts)


def bench_stage2(cfg, model, variables):
    from mpreid_tpu.engine.steps import make_train_step
    from mpreid_tpu.engine.train_state import initial_state
    from mpreid_tpu.losses import make_loss
    from mpreid_tpu.solver import make_optimizer

    batch, iters = 64, 20
    rng = np.random.RandomState(0)
    loss_fn, _ = make_loss(cfg, 1000)
    opt = make_optimizer(cfg.SOLVER.STAGE2, variables["params"], stage="stage2a")
    tf = jnp.asarray(rng.randn(1000, 512).astype(np.float32))
    step = make_train_step(model, cfg, loss_fn, opt, uniprompt=True, text_features=tf)
    state = initial_state(jax.tree_util.tree_map(jnp.array, variables), opt)
    b = {
        "images": jnp.asarray(rng.randint(0, 255, (batch, 256, 128, 3), dtype=np.uint8)),
        "pids": jnp.asarray((np.arange(batch) // 4 % 1000).astype(np.int32)),
        "camids": jnp.zeros(batch, jnp.int32),
        "trackids": jnp.zeros(batch, jnp.int32),
    }
    key = jax.random.PRNGKey(0)
    state, m = step(state, b, 5e-6, key)
    _ = float(m["loss"])
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _i in range(iters):
            state, m = step(state, b, 5e-6, key)
        _ = float(m["loss"])
        _ = float(jnp.sum(jax.tree_util.tree_leaves(state.params)[0]))
        dts.append(time.perf_counter() - t0)
    return iters * batch / min(dts)


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "both"
    patch_policy()
    cfg, model, variables = build()
    if what in ("stage1", "both"):
        for text_layout, pol in [
            ("hm", "pallas"),          # current default
            ("hm_native", "pallas"),   # stored-head-major (no fwd gather)
            ("hm", "xla"),             # measured dead end (re-verification)
        ]:
            set_config("packed", text_layout, pol)
            ips = bench_stage1(cfg, model, variables)
            print(f"stage1a text={text_layout:9s} masked={pol:6s} "
                  f"{ips:7.1f} img/s", flush=True)
    if what in ("stage2", "both"):
        for vision_layout in ("packed", "hm", "hm_native"):
            set_config(vision_layout, "hm", "pallas")
            ips = bench_stage2(cfg, model, variables)
            print(f"stage2a vision={vision_layout:9s} "
                  f"{ips:7.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
