"""Drives bench.py's FULL main() control flow tiny on CPU.

tests/test_benchkit.py covers the shared program builders; this covers the
glue that only bench.py has — section ordering, the per-section fault
guards, the dead-backend subprocess failover, donated-state threading
across sections, HBM frees, FLOPs/MFU arithmetic and extras assembly. A
wiring bug here would otherwise surface only in the driver's TPU bench
run, nulling the recorded metrics for the round.
"""

import json
import sys
import os.path as osp

import pytest

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))
import bench  # noqa: E402


def test_wait_for_backend_success_and_budget():
    # healthy backend: first probe returns immediately (budget generous —
    # interpreter startup on this 1-core host can exceed 5 s when another
    # test job loads the CPU)
    ok = bench.wait_for_backend(
        max_wait_s=60, probe_timeout_s=30,
        probe_argv=[sys.executable, "-c", "pass"],
    )
    assert ok

    # persistently failing probe: budget exhausts, returns False (caller
    # proceeds and surfaces the real error)
    ok = bench.wait_for_backend(
        max_wait_s=1.0, probe_timeout_s=1.0, retry_sleep_s=0.2,
        probe_argv=[sys.executable, "-c", "raise SystemExit(1)"],
    )
    assert not ok

    # hung probe (the wedged-tunnel mode): killed by the timeout, budget
    # exhausts instead of hanging the bench
    ok = bench.wait_for_backend(
        max_wait_s=2.0, probe_timeout_s=0.5, retry_sleep_s=0.2,
        probe_argv=[sys.executable, "-c", "import time; time.sleep(60)"],
    )
    assert not ok


def test_main_exits_with_null_json_when_backend_unreachable(
        monkeypatch, capsys):
    # a wedged tunnel hangs backend init forever — after the probe budget
    # main must emit an honest no-measurement line and exit nonzero rather
    # than hang whatever invoked it
    monkeypatch.setattr(bench, "wait_for_backend", lambda: False)
    with pytest.raises(SystemExit) as exc:
        bench.main(smoke=False)
    assert exc.value.code == 1
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["value"] is None
    assert "unreachable" in out["error"]


def test_backend_dead_error_classifier():
    dead = [
        RuntimeError("UNAVAILABLE: TPU worker process crashed or restarted"),
        OSError("Socket closed"),
        RuntimeError("failed to connect to remote runtime"),
    ]
    alive = [
        RuntimeError("injected section failure"),
        ValueError("shape mismatch (64, 3) vs (64, 4)"),
        RuntimeError("DEADLINE_EXCEEDED: compile took too long"),  # healthy
        MemoryError("RESOURCE_EXHAUSTED: out of memory on device"),
        # prose 'unavailable' without the gRPC status colon = NOT dead
        RuntimeError("custom call target 'mosaic' unavailable on this platform"),
    ]
    for e in dead:
        assert bench._backend_dead_error(e), e
    for e in alive:
        assert not bench._backend_dead_error(e), e


def test_section_subprocess_retries_transient_death(monkeypatch, capsys):
    """A hung/failed isolated-section child is retried ONCE in a fresh
    process (r5 bench run 2: the remote worker died mid-msmt_rerank and
    the child sat at zero CPU on an RPC that never completed while a fresh
    probe saw a healthy device — one retry recovers the section)."""
    import subprocess as sp

    calls = []

    def fake_run(argv, **kw):
        calls.append(argv)
        if len(calls) == 1:
            raise sp.TimeoutExpired(cmd=argv, timeout=kw.get("timeout"))

        class R:
            returncode = 0
            stderr = ""
            stdout = bench._SECTION_MARKER + json.dumps(
                {"section": "msmt_rerank",
                 "extras": {"msmt_scale_rerank_seconds": 7.0}}
            ) + "\n"
        return R()

    monkeypatch.setattr(sp, "run", fake_run)
    out = bench._section_subprocess("msmt_rerank", smoke=True, timeout_s=5)
    assert out == {"msmt_scale_rerank_seconds": 7.0}
    assert len(calls) == 2 and calls[0] == calls[1]
    assert "timed out" in capsys.readouterr().err

    # both attempts failing → None (the section records null, run continues)
    calls.clear()

    def always_fail(argv, **kw):
        calls.append(argv)

        class R:
            returncode = 1
            stderr = "boom"
            stdout = ""
        return R()

    monkeypatch.setattr(sp, "run", always_fail)
    assert bench._section_subprocess("msmt_rerank", smoke=True,
                                     timeout_s=5) is None
    assert len(calls) == 2
    _ = capsys.readouterr()


@pytest.mark.slow
def test_dead_backend_flips_remaining_sections_to_subprocess(
        monkeypatch, capsys):
    """Once a section dies with a dead-backend signature, the failed
    section AND every later one must be retried/dispatched in fresh
    subprocesses instead of burning on the broken in-process client —
    the exact failure mode that nulled five sections in round 4."""
    calls = []

    def fake_subprocess(name, smoke, timeout_s=None):
        calls.append(name)
        # recovered numbers come back from the fresh process
        if name == "eval_scan":
            return {"gallery_feats_per_sec_per_chip": 42.0}
        return {}

    def boom(ctx):
        raise RuntimeError(
            "UNAVAILABLE: TPU worker process crashed or restarted")

    monkeypatch.setattr(bench, "_section_subprocess", fake_subprocess)
    monkeypatch.setitem(bench.SECTIONS, "eval_scan", boom)
    result = bench.main(smoke=True)
    _ = capsys.readouterr()

    # the dying section was retried in a subprocess and its recovered
    # number made it into the artifact
    assert calls[0] == "eval_scan"
    assert result["extras"]["gallery_feats_per_sec_per_chip"] == 42.0
    # every section AFTER the death went to subprocesses too (in order),
    # ending with the always-isolated pair
    assert calls[-2:] == ["msmt_rerank", "uniprompt_pipeline"]
    assert "stage2_dispatch" in calls and "ttpt" in calls
    # sections BEFORE the death ran in-process
    assert "stage1a" not in calls and "matmul_ceiling" not in calls
    assert result["value"] > 0


@pytest.mark.slow
def test_fault_barriers_null_failed_sections_only(monkeypatch, capsys):
    """A failed section must record null under ITS keys — never another
    program's number — and must not take sibling sections down with it.

    Injects failures into (a) the stage-2 epoch scan (the headline stage-2
    program: a silent fallback to the per-step-dispatch number here would be
    indistinguishable in the artifact) and (b) the RN50 train half (whose
    barrier is split from RN50 eval so a completed eval window survives).
    The always-isolated subprocess pair is stubbed out here — its real
    spawning is covered once, in test_bench_main_smoke."""
    import mpreid_tpu.engine.steps as steps
    from mpreid_tpu.utils import benchkit

    def boom(*a, **k):
        raise RuntimeError("injected section failure")

    monkeypatch.setattr(steps, "make_train_epoch", boom)
    monkeypatch.setattr(benchkit, "baseline_harness", boom)
    monkeypatch.setattr(
        bench, "_section_subprocess", lambda *a, **k: None
    )
    result = bench.main(smoke=True)
    _ = capsys.readouterr()
    ex = result["extras"]

    # failed sections are null, including everything derived from them
    for key in ("stage2_train_img_per_sec", "stage2_achieved_tflops",
                "mfu_stage2_vs_measured_matmul", "mfu_stage2",
                "rn50_train_img_per_sec", "mfu_rn50_train_vs_measured_matmul",
                "msmt_scale_rerank_seconds", "uniprompt_pipeline_seconds"):
        assert ex[key] is None, key

    # siblings of the failed sections survive
    assert result["value"] > 0
    assert ex["stage2_img_per_sec_per_step_dispatch"] > 0
    assert ex["rn50_eval_feats_per_sec"] > 0
    assert ex["mfu_rn50_eval_vs_measured_matmul"] is not None
    assert ex["rn50_fwd_gflops_per_img"] > 0
    assert ex["tta_feats_per_sec"] > 0


@pytest.mark.slow
def test_bench_main_smoke(capsys):
    result = bench.main(smoke=True)

    # printed artifact is ONE parseable JSON line matching the return value
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line) == result

    # headline metric ran
    assert result["metric"] == "stage1a_prompt_train_img_per_sec"
    assert result["value"] > 0
    assert result["vs_baseline"] > 0
    ex = result["extras"]

    # every guarded section completed — a None here means a section raised
    # (the guard printed the traceback summary to stderr). The msmt_rerank
    # and uniprompt_pipeline entries prove the SUBPROCESS isolation path
    # end-to-end: fresh interpreter, marker-JSON protocol, parent merge.
    for key in (
        "gallery_feats_per_sec_per_chip",
        "stage2_train_img_per_sec",
        "stage2_img_per_sec_per_step_dispatch",
        "stage2_b128_img_per_sec",
        "stage1b_img_per_sec",
        "stage2b_moe_img_per_sec",
        "rn50_eval_feats_per_sec",
        "rn50_train_img_per_sec",
        "stage1a_img_per_sec_per_iter_dispatch",
        "market_scale_rerank_seconds",
        "matmul_tflops_measured",
        "msmt_scale_rerank_seconds",
        "tta_feats_per_sec",
        "ttpt_queries_per_sec",
        "uniprompt_pipeline_seconds",
    ):
        assert ex[key] is not None and ex[key] > 0, key

    # derived keys exist (their rounded values can be 0.0 at tiny scale —
    # tiny-model TFLOP/s round below the artifact's decimal precision)
    for key in (
        "stage2_achieved_tflops",
        "eval_achieved_tflops",
        "mfu_stage2_vs_measured_matmul",
        "mfu_eval_vs_measured_matmul",
        "mfu_rn50_eval_vs_measured_matmul",
        "mfu_rn50_train_vs_measured_matmul",
        "market_scale_rerank_speedup_vs_reference_cpu_1core",
        "model_fwd_gflops_per_img",
        "rn50_fwd_gflops_per_img",
        "msmt_rerank_sampled_rows_max_err_vs_exact",
        "msmt_rerank_rank1_delta",
        "msmt_rerank_top1_disagreement",
    ):
        assert ex[key] is not None, key


@pytest.mark.slow
def test_single_section_cli_smoke():
    """`bench.py --section NAME --smoke` is the crash-bisect tool and the
    failover path's building block — one fresh process, one marker line."""
    import subprocess

    root = osp.join(osp.dirname(__file__), "..")
    r = subprocess.run(
        [sys.executable, osp.join(root, "bench.py"),
         "--section", "market_rerank", "--smoke"],
        capture_output=True, text=True, timeout=600, cwd=root,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    payload = None
    for line in r.stdout.splitlines():
        if line.startswith(bench._SECTION_MARKER):
            payload = json.loads(line[len(bench._SECTION_MARKER):])
    assert payload is not None
    assert payload["section"] == "market_rerank"
    assert payload["extras"]["market_scale_rerank_seconds"] > 0

    # unknown section: marked error, nonzero exit
    r = subprocess.run(
        [sys.executable, osp.join(root, "bench.py"),
         "--section", "nope", "--smoke"],
        capture_output=True, text=True, timeout=120, cwd=root,
    )
    assert r.returncode == 2
