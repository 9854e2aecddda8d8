"""A/B the eval-forward batch size on the TPU (gallery feats/s).

Eval throughput is the BASELINE.json north-star; batch 128 beat 64 by
~2.4% in round 3. This sweeps further sizes with the same scan-compiled
window bench.py uses (mpreid_tpu.utils.benchkit.make_eval_scan — results
depend on every output element; values fetched to synchronize through the
remote tunnel).

Usage: python tools/bench_eval_batch.py [sizes...]   (default 128 256 512)
"""

import sys

sys.path.insert(0, ".")

from mpreid_tpu.utils import benchkit  # noqa: E402


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [128, 256, 512]
    cfg, model, variables = benchkit.uniprompt_env()
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    for batch in sizes:
        iters = max(8, 5120 // batch)  # ~same images per window
        run = benchkit.make_eval_scan(cfg, model, params, batch_stats,
                                      batch=batch, iters=iters)
        dt = benchkit.best_of(benchkit.timed(run), windows=3)
        print(f"eval batch={batch:4d} iters={iters:3d} "
              f"{iters * batch / dt:8.1f} feats/s", flush=True)


if __name__ == "__main__":
    main()
