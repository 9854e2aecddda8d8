"""A/B the eval-forward batch size on the TPU (gallery feats/s).

Eval throughput is the BASELINE.json north-star; batch 128 beat 64 by
~2.4% in round 3. This sweeps further sizes with the same scan-compiled
window bench.py uses (results depend on every output element; values
fetched to synchronize through the remote tunnel).

Usage: python tools/bench_eval_batch.py [sizes...]   (default 128 256 512)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    import functools

    from mpreid_tpu.config import get_default_cfg
    from mpreid_tpu.models import init_variables, make_model_uniprompt
    from mpreid_tpu.ops.augment import eval_preprocess

    sizes = [int(s) for s in sys.argv[1:]] or [128, 256, 512]

    cfg = get_default_cfg()
    cfg.MODEL.NAME = "ViT-B-16"
    cfg.INPUT.SIZE_TRAIN = [256, 128]
    cfg.INPUT.SIZE_TEST = [256, 128]
    model = make_model_uniprompt(cfg, num_class=1000, camera_num=14, view_num=1)
    variables = init_variables(model, jax.random.PRNGKey(0), cfg)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    rng = np.random.RandomState(0)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def eval_bench(params, batch_stats, images_u8, iters):
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

        carry, sums = jax.lax.scan(body, jnp.zeros((), jnp.uint8), None, length=iters)
        return jnp.sum(sums)

    for batch in sizes:
        iters = max(8, 5120 // batch)  # ~same images per window
        images = jnp.asarray(
            rng.randint(0, 255, (batch, 256, 128, 3), dtype=np.uint8)
        )
        _ = float(eval_bench(params, batch_stats, images, iters))  # compile
        dts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(eval_bench(params, batch_stats, images, iters))
            dts.append(time.perf_counter() - t0)
        print(f"eval batch={batch:4d} iters={iters:3d} "
              f"{iters * batch / min(dts):8.1f} feats/s", flush=True)


if __name__ == "__main__":
    main()
