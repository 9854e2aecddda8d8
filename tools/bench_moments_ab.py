"""A/B SOLVER.MOMENT_DTYPE (fp32 vs bf16 Adam moments) in real train steps.

The Adam update is HBM-bound (~4.7 ms / 513 GB/s for the 87M trainable
stage-2 params on the v5e; ~8.5 ms of the RN50 step) — bf16 moment storage
halves the optimizer-state traffic. This times the full stage-2a step and
the RN50 baseline step under both dtypes, on the SAME measured programs
bench.py records (mpreid_tpu.utils.benchkit).

Usage: python tools/bench_moments_ab.py [stage2|rn50|both]
"""

import sys

sys.path.insert(0, ".")

from mpreid_tpu.utils import benchkit  # noqa: E402


def bench_stage2(md):
    cfg, model, variables = benchkit.uniprompt_env()
    cfg.SOLVER.STAGE2.MOMENT_DTYPE = md
    h = benchkit.stage2_harness(cfg, model, variables)
    iters = 20
    dt = benchkit.best_of(benchkit.step_window(h, iters=iters), windows=3)
    return iters * h["batch"]["images"].shape[0] / dt


def bench_rn50(md):
    cfg, model, variables = benchkit.rn50_env()
    cfg.SOLVER.MOMENT_DTYPE = md
    h = benchkit.baseline_harness(cfg, model, variables)
    iters = 20
    dt = benchkit.best_of(benchkit.step_window(h, iters=iters), windows=3)
    return iters * h["batch"]["images"].shape[0] / dt


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "both"
    if what in ("stage2", "both"):
        for md in ("float32", "bfloat16"):
            print(f"stage2a moments={md:8s} {bench_stage2(md):7.1f} img/s",
                  flush=True)
    if what in ("rn50", "both"):
        for md in ("float32", "bfloat16"):
            print(f"rn50    moments={md:8s} {bench_rn50(md):7.1f} img/s",
                  flush=True)


if __name__ == "__main__":
    main()
