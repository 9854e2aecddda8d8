"""Sweep the head-major attention kernel tile sizes INSIDE the real
stage-2a train step (the authority — isolated kernel chains mislead at
these shapes, see CLAUDE.md round-3 findings).

The hm kernels tile the pallas grid (batch-tile BT × head-group HG); fwd
and bwd knobs are independent (ops/attention.py _BT_HM_*/_HG_HM_*). Each
config rebuilds the jitted step (the knobs are read at trace time).

Usage: python tools/bench_attn_tiles.py [stage2|stage1|both] [windows]
Run on an IDLE host — concurrent CPU load deflates dispatch-bound rows.
"""

import sys

sys.path.insert(0, ".")

from mpreid_tpu.ops import attention as attn  # noqa: E402


def set_tiles(bt_fwd, hg_fwd, vmem_fwd, bt_bwd, hg_bwd, vmem_bwd):
    attn._BT_HM_FWD, attn._HG_HM_FWD = bt_fwd, hg_fwd
    attn._BT_HM_BWD, attn._HG_HM_BWD = bt_bwd, hg_bwd
    # per-direction scoped-VMEM limits: relaxing one kernel's budget must
    # not change the OTHER kernel's Mosaic scheduling (a shared limit made
    # the r4 sweep's fwd-only rows non-isolated A/Bs of tile shape)
    attn._VMEM_HM_FWD = vmem_fwd << 20
    attn._VMEM_HM_BWD = vmem_bwd << 20


# (bt_fwd, hg_fwd, vmem_fwd_MB, bt_bwd, hg_bwd, vmem_bwd_MB). Head-group
# picks round up via _pick_hg: dh=64 needs hg even; hg must divide 12
# (vision) / 8 (text). Measured (r4): fwd BT=64 HG=2 needs a 37.1M
# scoped-vmem stack — those rows get 64M on the fwd side only. A config
# that still OOMs prints "FAILED" and the sweep continues.
CONFIGS = [
    (32, 2, 32, 32, 2, 32),   # round-3 default
    (64, 2, 64, 32, 2, 32),   # fwd whole-batch tile
    (64, 2, 64, 64, 2, 64),   # whole-batch both
    (32, 4, 32, 32, 2, 32),   # wider fwd head group
    (32, 4, 32, 32, 4, 64),   # wider both
    (16, 4, 32, 16, 4, 32),   # smaller batch tile, wider heads
    (64, 4, 64, 32, 2, 32),   # big fwd tile
    (16, 2, 32, 16, 2, 32),   # round-2 shape
]


def main():
    from mpreid_tpu.utils import benchkit

    what = sys.argv[1] if len(sys.argv) > 1 else "stage2"
    windows = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cfg, model, variables = benchkit.uniprompt_env()
    for bt_f, hg_f, vm_f, bt_b, hg_b, vm_b in CONFIGS:
        set_tiles(bt_f, hg_f, vm_f, bt_b, hg_b, vm_b)
        tag = (f"fwd BT={bt_f:2d} HG={hg_f} vmem {vm_f:2d}M | "
               f"bwd BT={bt_b:2d} HG={hg_b} vmem {vm_b:2d}M")
        if what in ("stage2", "both"):
            h = None  # release the prior config's donated state FIRST
            try:
                h = benchkit.stage2_harness(cfg, model, variables)
                iters = 20
                dt = benchkit.best_of(benchkit.step_window(h, iters=iters),
                                      windows=windows)
                ips = iters * h["batch"]["images"].shape[0] / dt
                print(f"stage2a {tag}  {ips:7.1f} img/s", flush=True)
            except Exception as e:  # vmem OOM at big tiles — keep sweeping
                print(f"stage2a {tag}  FAILED: {str(e)[:120]}", flush=True)
            finally:
                h = None  # free the donated state's HBM before the next cfg
        if what in ("stage1", "both"):
            h = None  # release the prior config's donated state FIRST
            try:
                h = benchkit.stage1_harness(cfg, model, variables)
                dt = benchkit.best_of(benchkit.epoch_window(h),
                                      windows=windows)
                ips = h["iters"] * h["batch"] / dt
                print(f"stage1a {tag}  {ips:7.1f} img/s", flush=True)
            except Exception as e:
                print(f"stage1a {tag}  FAILED: {str(e)[:120]}", flush=True)
            finally:
                h = None


if __name__ == "__main__":
    main()
