"""A/B the fused Pallas Adam update against the XLA tree_map path on TPU.

Isolates the optimizer-update lane of the stage-2 step (profiled HBM-bound
at ~513 GB/s / ~4.7 ms for the 87M trainable params, round-3 roofline):
builds a synthetic tree mirroring the ViT-B/16 stage-2a trainable leaves,
then times Adam updates through solver.optim.Optimizer with FUSED_ADAM on
vs off, 200-iter chains (the remote tunnel adds ~20-40 ms per fetch; short
chains measure the tunnel).

Run on the TPU:  python tools/bench_adam_ab.py
"""

import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mpreid_tpu.config import get_default_cfg
    from mpreid_tpu.solver.optim import Optimizer

    # ViT-B/16 stage-2a trainable shapes (per block: in_proj, out_proj,
    # c_fc, c_proj + LNs), conv patchify, pos-embed, proj, BNNecks
    d = 768
    leaves = {}
    for i in range(12):
        p = f"visual/resblocks_{i}"
        leaves[f"{p}/attn/in_proj_kernel"] = (d, 3 * d)
        leaves[f"{p}/attn/in_proj_bias"] = (3 * d,)
        leaves[f"{p}/attn/out_proj_kernel"] = (d, d)
        leaves[f"{p}/attn/out_proj_bias"] = (d,)
        leaves[f"{p}/mlp/c_fc/kernel"] = (d, 4 * d)
        leaves[f"{p}/mlp/c_fc/bias"] = (4 * d,)
        leaves[f"{p}/mlp/c_proj/kernel"] = (4 * d, d)
        leaves[f"{p}/mlp/c_proj/bias"] = (d,)
        for ln in ("ln_1", "ln_2"):
            leaves[f"{p}/{ln}/scale"] = (d,)
            leaves[f"{p}/{ln}/bias"] = (d,)
    leaves["visual/conv1/kernel"] = (16, 16, 3, d)
    leaves["visual/positional_embedding"] = (129, d)
    leaves["visual/proj"] = (d, 512)
    leaves["bottleneck/scale"] = (d,)
    leaves["classifier/kernel"] = (d, 1000)

    rng = np.random.RandomState(0)

    def tree(scale):
        out = {}
        for name, shape in leaves.items():
            node = out
            for part in name.split("/")[:-1]:
                node = node.setdefault(part, {})
            node[name.split("/")[-1]] = jnp.asarray(
                rng.randn(*shape).astype(np.float32) * scale
            )
        return out

    params = tree(0.02)
    n_elems = sum(np.prod(s) for s in leaves.values())
    print(f"{len(leaves)} leaves, {n_elems/1e6:.1f}M params "
          f"({n_elems*28/1e9:.2f} GB p/m/v/g traffic per step)")

    cfg = get_default_cfg()
    iters = 200

    for fused in (False, True):
        cfg.SOLVER.FUSED_ADAM = fused
        opt = Optimizer("Adam", params, cfg.SOLVER, stage="baseline")
        train, _ = opt.partition(params)
        state = opt.init(params)

        @jax.jit
        def run(train, state, seed):
            def body(carry, i):
                tr, st = carry
                # synthetic grads derived from the params (data dependency)
                grads = {k: 0.01 * v * (1.0 + seed) + 1e-4 * i
                         for k, v in tr.items()}
                tr2, st2 = opt.update(grads, st, tr, 3e-4)
                return (tr2, st2), ()

            (tr, st), _ = jax.lax.scan(
                body, (train, state), jnp.arange(iters, dtype=jnp.float32)
            )
            return tr, st

        tr, st = run(train, state, jnp.float32(0.0))  # compile
        _ = float(jax.tree_util.tree_leaves(tr)[0].sum())
        dts = []
        for w in range(2):
            t0 = time.perf_counter()
            tr, st = run(tr, st, jnp.float32(w + 1))
            _ = float(jax.tree_util.tree_leaves(tr)[0].sum())
            dts.append(time.perf_counter() - t0)
        ms = min(dts) / iters * 1e3
        gbs = n_elems * 28 / (min(dts) / iters) / 1e9
        print(f"fused={fused}: {ms:.3f} ms/update  ({gbs:.0f} GB/s)")


if __name__ == "__main__":
    main()
