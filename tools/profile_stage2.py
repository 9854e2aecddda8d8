"""Profile the stage-2 train step (or eval forward) on the TPU.

Uses jax.profiler.trace and parses the xplane.pb directly (the
tensorboard_plugin_profile converter is version-broken on this host —
see CLAUDE.md). Aggregates the XLA-Ops line by hlo_category (with achieved
TF/s and GB/s per category — a roofline view) and by op name prefix.

Usage:
  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
      python tools/profile_stage2.py [out_dir] [--eval|--moe|--epoch] [--parse-only] [--steps N]

--eval profiles the batch-128 eval forward (the gallery-extraction
north-star), --moe the stage-2b MoE train step (routing + expert einsum +
aux loss decomposition, VERDICT r3 weak #5), --epoch the stage-2a epoch
SCAN (bench.py's headline program) instead of the stage-2a train step.
--parse-only re-analyzes an existing trace directory without touching the
device.

Scan traces double-count: the xplane emits the outer ``while`` op as ONE
envelope event spanning the whole scan AND each body op individually, so
summing every event counts the body twice. The parser therefore pulls the
``while`` hlo_category out of the total and reports it separately — the
envelope's ms/step IS the scan body per-iteration device cost (r4 measure:
34.17 ms/iter, equal to the bare step — zero carry overhead), and the
category/op tables below it decompose that same time.
"""

import collections
import glob
import os
import sys

# Shared step counts: the trace capture AND the --parse-only fallback must
# agree on how many steps a trace contains, or re-parsing reports wrong
# ms/step (ADVICE r4). Pass an explicit count via --steps N when re-parsing
# a trace captured with non-default lengths.
EPOCH_ITERS = 20
EVAL_ITERS = 40

import numpy as np

sys.path.insert(0, ".")


def build_step():
    """The canonical stage-2a train step (benchkit — the same program
    bench.py times). Returns (step, state, batch_d)."""
    from mpreid_tpu.utils import benchkit

    cfg, model, variables = benchkit.uniprompt_env()
    h = benchkit.stage2_harness(cfg, model, variables)
    return h["step"], h["state"], h["batch"]


def build_moe_step():
    """The stage-2b MoE train step (4 experts, top-2, 2 MoE layers, gate +
    encoder-minus-experts trainable) — the same program bench.py's
    stage2b_moe section times. Returns (step, state, batch_d)."""
    import jax
    import jax.numpy as jnp

    from mpreid_tpu.engine.steps import make_train_step
    from mpreid_tpu.engine.train_state import initial_state
    from mpreid_tpu.models import switch_to_moe
    from mpreid_tpu.solver import make_optimizer
    from mpreid_tpu.utils import benchkit

    cfg, model, variables = benchkit.uniprompt_env()
    h = benchkit.stage2_harness(cfg, model, variables)
    cfg.MODEL.MOE.ENABLED = True
    cfg.MODEL.MOE.NUM_EXPERTS = 4
    cfg.MODEL.MOE.TOP_K = 2
    cfg.MODEL.MOE.MOE_LAYERS = 2
    moe_model, moe_vars = switch_to_moe(cfg, model, variables)
    opt2b = make_optimizer(cfg.SOLVER.STAGE2, moe_vars["params"],
                           stage="stage2b")
    step = make_train_step(
        moe_model, cfg, h["loss_fn"], opt2b, uniprompt=True,
        text_features=h["text_features"],
    )
    state = initial_state(
        jax.tree_util.tree_map(jnp.array, moe_vars), opt2b
    )
    h["state"] = None  # free the dense harness state's HBM
    return step, state, h["batch"]


def build_epoch(iters: int = EPOCH_ITERS, batch: int = 64):
    """The stage-2a EPOCH SCAN (bench.py's headline stage-2 program:
    make_train_epoch over a device-resident uint8 dataset). Returns
    (run, iters) where run() executes one epoch and fetches results —
    profiles the scan's per-iter cost incl. dataset gather + carry
    handling, which the bare-step profile can't see."""
    import jax
    import jax.numpy as jnp

    from mpreid_tpu.engine.steps import make_train_epoch
    from mpreid_tpu.engine.train_state import initial_state
    from mpreid_tpu.utils import benchkit

    cfg, model, variables = benchkit.uniprompt_env()
    h = benchkit.stage2_harness(cfg, model, variables, batch=batch)
    epoch = make_train_epoch(
        model, cfg, h["loss_fn"], h["opt"], uniprompt=True,
        text_features=h["text_features"],
    )
    rng = np.random.RandomState(0)
    n_data = iters * batch
    th, tw = cfg.INPUT.SIZE_TRAIN
    ds_images = jnp.asarray(
        rng.randint(0, 255, (n_data, th, tw, 3), dtype=np.uint8)
    )
    ds_pids = jnp.asarray((np.arange(n_data) // 4 % 1000).astype(np.int32))
    ds_zeros = jnp.zeros(n_data, jnp.int32)
    perm = jnp.arange(n_data).reshape(iters, batch)
    key = h["key"]
    h["state"] = None  # free the per-step harness state's HBM
    fresh = lambda: jax.tree_util.tree_map(jnp.array, variables)
    box = {"state": initial_state(fresh(), h["opt"])}

    def run():
        state, (losses, _) = epoch(
            box["state"], ds_images, ds_pids, ds_zeros, ds_zeros, perm,
            5e-6, key,
        )
        _ = float(jnp.sum(losses))
        _ = float(jnp.sum(jax.tree_util.tree_leaves(state.params)[0]))
        box["state"] = state

    return run, iters


def build_eval(batch: int = 128, iters: int = EVAL_ITERS):
    """Batch-128 eval forward as ONE jitted scan of ``iters`` iterations
    (benchkit — bench.py's eval section). Returns (run, iters)."""
    from mpreid_tpu.utils import benchkit

    cfg, model, variables = benchkit.uniprompt_env()
    run = benchkit.make_eval_scan(
        cfg, model, variables["params"], variables.get("batch_stats", {}),
        batch=batch, iters=iters,
    )
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
    while_env = 0.0  # scan envelopes — their body ops are counted above
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
                nm, cat, flops, nbytes = meta.get(
                    ev.metadata_id, ("?", "?", 0, 0)
                )
                if cat == "while":
                    while_env += dur
                    continue
                total += dur
                by_cat[cat] += dur
                cat_flops[cat] += flops
                cat_bytes[cat] += nbytes
                by_name[nm.split(".")[0]] += dur
    return by_cat, cat_flops, cat_bytes, by_name, total, while_env


def main():
    import jax

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_dir = args[0] if args else "/tmp/stage2_profile"
    n_steps = 5
    if "--parse-only" not in sys.argv:
        if "--eval" in sys.argv or "--epoch" in sys.argv:
            run, n_steps = (build_eval() if "--eval" in sys.argv
                            else build_epoch())
            run()  # compile + warm
            run()
            with jax.profiler.trace(out_dir):
                run()
        else:
            step, state, batch_d = (
                build_moe_step() if "--moe" in sys.argv else build_step()
            )
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
        n_steps = EVAL_ITERS
    elif "--epoch" in sys.argv:
        n_steps = EPOCH_ITERS
    for i, a in enumerate(sys.argv):
        if a == "--steps":  # explicit override for re-parsing odd traces
            n_steps = int(sys.argv[i + 1])

    by_cat, cat_flops, cat_bytes, by_name, total, while_env = parse_xplane(
        out_dir
    )
    print(f"total device time: {total*1e3:.2f} ms over {n_steps} steps "
          f"({total/n_steps*1e3:.2f} ms/step)")
    if while_env:
        print(f"while/scan envelope: {while_env/n_steps*1e3:.2f} ms/step "
              "(body ops counted individually above; excluded from total)")
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
