"""Standalone repro of bench.py's msmt_rerank section (crash bisect, r5).

Round 4's bench died with "TPU worker process crashed or restarted"
somewhere in/after this section, nulling everything downstream. This runs
the identical workload alone in a fresh process so the crash (if it
reproduces) is attributable, and prints the chip's live-memory watermark
around each phase.

Usage: python tools/repro_msmt.py [--quantized-only|--exact-rows-only]
"""

import sys
import time

sys.path.insert(0, ".")


def mem(tag):
    import jax

    try:
        stats = jax.devices()[0].memory_stats()
        live = stats.get("bytes_in_use", 0) / 1e9
        peak = stats.get("peak_bytes_in_use", 0) / 1e9
        print(f"[mem] {tag}: live {live:.2f} GB, peak {peak:.2f} GB",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[mem] {tag}: unavailable ({e})", flush=True)


def main():
    import jax.numpy as jnp
    import numpy as np

    from mpreid_tpu.ops.reranking_sparse import (
        re_ranking_sparse, re_ranking_sparse_rows,
    )

    rng = np.random.RandomState(0)
    Q, G, D = 11659, 82161, 512
    for i, a in enumerate(sys.argv):
        if a == "--q":
            Q = int(sys.argv[i + 1])
        if a == "--g":
            G = int(sys.argv[i + 1])
    print(f"Q={Q} G={G} D={D}", flush=True)
    n_ids = 3000
    kw = dict(k1=50, k2=15)
    centers = rng.randn(n_ids, D).astype(np.float32)
    qf = jnp.asarray(
        (centers[rng.randint(0, n_ids, Q)]
         + rng.randn(Q, D) * 0.7).astype(np.float32)
    )
    gf = jnp.asarray(
        (centers[rng.randint(0, n_ids, G)]
         + rng.randn(G, D) * 0.7).astype(np.float32)
    )
    mem("after feature upload")

    if "--exact-rows-only" not in sys.argv:
        print("compiling+running quantized full matrix...", flush=True)
        t0 = time.perf_counter()
        d = re_ranking_sparse(qf, gf, minsum="quantized", **kw)
        s = float(jnp.sum(d))
        print(f"quantized compile+run: {time.perf_counter()-t0:.1f}s "
              f"sum={s:.3e}", flush=True)
        mem("after quantized run")
        t0 = time.perf_counter()
        d = re_ranking_sparse(qf, gf, minsum="quantized", **kw)
        s = float(jnp.sum(d))
        dt = time.perf_counter() - t0
        print(f"quantized steady run: {dt:.1f}s sum={s:.3e}", flush=True)
        mem("after second quantized run")
        rows = np.asarray([0, Q // 2, Q - 1], np.int32)
        d_rows = np.asarray(d[jnp.asarray(rows)])
        del d
    else:
        rows = np.asarray([0, Q // 2, Q - 1], np.int32)
        d_rows = None

    if "--quantized-only" not in sys.argv:
        print("compiling+running exact sampled rows...", flush=True)
        t0 = time.perf_counter()
        exact_rows = np.asarray(re_ranking_sparse_rows(
            qf, gf, jnp.asarray(rows), **kw
        ))
        print(f"exact rows: {time.perf_counter()-t0:.1f}s", flush=True)
        mem("after exact rows")
        if d_rows is not None:
            err = float(np.max(np.abs(d_rows - exact_rows)))
            print(f"max |quantized - exact| on sampled rows: {err:.4f}",
                  flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
