"""Idle-host A/B of the stage-2 dispatch-mode step across pinned commits.

VERDICT r4 weak #5: `stage2_img_per_sec_per_step_dispatch` read 1664.9 in
BENCH_r03 and 1641.2 in BENCH_r04 (~-1.5%) while the epoch-scan headline
moved the other way. This driver measures ONLY the dispatch-mode stage-2
step (ref processor_uniprompt_stage2.py:88-156) with the exact bench.py
recipe — `benchkit.uniprompt_env` → `stage2_harness` → `step_window(20)`
best-of-2 — so it can run unmodified inside a `git worktree` checkout of
any commit whose benchkit exposes that API (true from r3-final e57652d
onward; all three signatures are identical).

Usage (from the worktree root, one fresh process per measurement):
    python tools/ab_stage2_dispatch.py [--iters 20]

Prints one JSON line {"img_per_sec": ..., "commit": ...}.  Run the A/B
interleaved (A,B,A,B) on an otherwise-idle host — CLAUDE.md r3/r4 notes:
host CPU contention and process-restart variance are ~±1.5% and swamp
smaller effects.
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--windows", type=int, default=2)
    args = ap.parse_args()

    from mpreid_tpu.utils import benchkit

    cfg, model, variables = benchkit.uniprompt_env()
    h2 = benchkit.stage2_harness(
        cfg, model, variables, num_classes=1000, batch=64,
        embed_dim=model.clip_config.embed_dim,
    )
    dt = benchkit.best_of(
        benchkit.step_window(h2, iters=args.iters), windows=args.windows
    )
    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
        text=True, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout.strip()
    print(json.dumps({
        "img_per_sec": args.iters * 64 / dt,
        "sec_per_step": dt / args.iters,
        "commit": commit,
    }))


if __name__ == "__main__":
    main()
