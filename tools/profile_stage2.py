"""Profile the stage-2 train step (or eval forward) on the TPU.

Uses jax.profiler.trace and parses the xplane.pb directly (the
tensorboard_plugin_profile converter is version-broken on this host —
see CLAUDE.md). Aggregates the XLA-Ops line by hlo_category (with achieved
TF/s and GB/s per category — a roofline view) and by op name prefix.

Usage:
  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
      python tools/profile_stage2.py [out_dir] [--eval] [--parse-only]

--eval profiles the batch-128 eval forward (the gallery-extraction
north-star) instead of the stage-2 train step. --parse-only re-analyzes an
existing trace directory without touching the device.
"""

import collections
import glob
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def build_step():
    import jax
    import jax.numpy as jnp

    from mpreid_tpu.config import get_default_cfg
    from mpreid_tpu.engine.steps import make_train_step
    from mpreid_tpu.engine.train_state import initial_state
    from mpreid_tpu.losses import make_loss
    from mpreid_tpu.models import init_variables, make_model_uniprompt
    from mpreid_tpu.solver import make_optimizer

    cfg = get_default_cfg()
    cfg.MODEL.NAME = "ViT-B-16"
    cfg.INPUT.SIZE_TRAIN = [256, 128]
    cfg.INPUT.SIZE_TEST = [256, 128]
    cfg.DATALOADER.SAMPLER = "softmax_triplet"
    cfg.MODEL.ID_LOSS_WEIGHT = 0.25
    num_classes, batch, embed_dim = 1000, 64, 512
    model = make_model_uniprompt(cfg, num_class=num_classes, camera_num=14, view_num=1)
    variables = init_variables(model, jax.random.PRNGKey(0), cfg)
    loss_fn, _ = make_loss(cfg, num_classes)
    opt = make_optimizer(cfg.SOLVER.STAGE2, variables["params"], stage="stage2a")
    rng = np.random.RandomState(0)
    text_features = jnp.asarray(rng.randn(num_classes, embed_dim).astype(np.float32))
    step = make_train_step(model, cfg, loss_fn, opt, uniprompt=True,
                           text_features=text_features)
    state = initial_state(variables, opt)
    batch_d = {
        "images": jnp.asarray(rng.randint(0, 255, (batch, 256, 128, 3), dtype=np.uint8)),
        "pids": jnp.asarray((np.arange(batch) // 4 % num_classes).astype(np.int32)),
        "camids": jnp.zeros(batch, jnp.int32),
        "trackids": jnp.zeros(batch, jnp.int32),
    }
    return step, state, batch_d


def build_eval(batch: int = 128, iters: int = 40):
    """Batch-128 eval forward as ONE jitted scan of ``iters`` iterations
    (mirrors bench.py's eval section). Returns (run, iters)."""
    import functools

    import jax
    import jax.numpy as jnp

    from mpreid_tpu.config import get_default_cfg
    from mpreid_tpu.models import init_variables, make_model_uniprompt
    from mpreid_tpu.ops.augment import eval_preprocess

    cfg = get_default_cfg()
    cfg.MODEL.NAME = "ViT-B-16"
    cfg.INPUT.SIZE_TRAIN = [256, 128]
    cfg.INPUT.SIZE_TEST = [256, 128]
    model = make_model_uniprompt(cfg, num_class=1000, camera_num=14, view_num=1)
    variables = init_variables(model, jax.random.PRNGKey(0), cfg)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 255, (batch, 256, 128, 3), dtype=np.uint8))

    @functools.partial(jax.jit, static_argnames=("n",))
    def eval_bench(params, batch_stats, images_u8, n):
        def body(carry, _):
            x = eval_preprocess(
                images_u8 + carry,
                mean=tuple(cfg.INPUT.PIXEL_MEAN),
                std=tuple(cfg.INPUT.PIXEL_STD),
            )
            f = model.apply(
                {"params": params, "batch_stats": batch_stats}, x, train=False
            )
            s = jnp.sum(f.astype(jnp.float32))
            return (s > 1e30).astype(jnp.uint8), s

        carry, sums = jax.lax.scan(body, jnp.zeros((), jnp.uint8), None, length=n)
        return jnp.sum(sums)

    def run():
        return float(eval_bench(params, batch_stats, images, iters))

    return run, iters


def parse_xplane(out_dir):
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane.pb under {out_dir}"
    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xs.ParseFromString(f.read())

    by_cat = collections.Counter()
    cat_flops = collections.Counter()
    cat_bytes = collections.Counter()
    by_name = collections.Counter()
    total = 0
    for plane in xs.planes:
        stat_names = {m.id: m.name for m in plane.stat_metadata.values()}
        # hlo_category / flops / bytes_accessed live on the EVENT METADATA
        # (per-op), not on the per-occurrence event stats
        meta = {}
        for mid, m in plane.event_metadata.items():
            cat, flops, nbytes = "?", 0, 0
            for s in m.stats:
                n = stat_names.get(s.metadata_id)
                if n == "hlo_category":
                    cat = s.str_value or "?"
                elif n == "flops":
                    flops = s.int64_value
                elif n == "bytes_accessed":
                    nbytes = s.int64_value
            meta[mid] = (m.name, cat, flops, nbytes)
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                dur = ev.duration_ps / 1e12
                total += dur
                nm, cat, flops, nbytes = meta.get(
                    ev.metadata_id, ("?", "?", 0, 0)
                )
                by_cat[cat] += dur
                cat_flops[cat] += flops
                cat_bytes[cat] += nbytes
                by_name[nm.split(".")[0]] += dur
    return by_cat, cat_flops, cat_bytes, by_name, total


def main():
    import jax

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_dir = args[0] if args else "/tmp/stage2_profile"
    n_steps = 5
    if "--parse-only" not in sys.argv:
        if "--eval" in sys.argv:
            run, n_steps = build_eval()
            run()  # compile + warm
            run()
            with jax.profiler.trace(out_dir):
                run()
        else:
            step, state, batch_d = build_step()
            key = jax.random.PRNGKey(0)
            state, m = step(state, batch_d, 5e-6, key)
            _ = float(m["loss"])  # compile + warm
            for _ in range(3):
                state, m = step(state, batch_d, 5e-6, key)
            _ = float(m["loss"])

            with jax.profiler.trace(out_dir):
                for _ in range(5):
                    state, m = step(state, batch_d, 5e-6, key)
                _ = float(m["loss"])
    elif "--eval" in sys.argv:
        n_steps = 40

    by_cat, cat_flops, cat_bytes, by_name, total = parse_xplane(out_dir)
    print(f"total device time: {total*1e3:.2f} ms over {n_steps} steps "
          f"({total/n_steps*1e3:.2f} ms/step)")
    print("\nby hlo_category (ms/step | achieved TF/s | GB/s):")
    for cat, dur in by_cat.most_common(15):
        tfs = cat_flops[cat] / dur / 1e12 if dur else 0.0
        gbs = cat_bytes[cat] / dur / 1e9 if dur else 0.0
        print(f"  {cat:28s} {dur/n_steps*1e3:8.3f} | {tfs:6.1f} | {gbs:7.1f}")
    print("\ntop ops (ms/step):")
    for nm, dur in by_name.most_common(25):
        print(f"  {nm:44s} {dur/n_steps*1e3:8.3f}")


if __name__ == "__main__":
    main()
