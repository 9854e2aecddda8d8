"""A/B the attention layout + policy inside the real stage-1a/2a steps.

Stage-1a is text-tower-only → sweeps TEXT_LAYOUT ('hm'/'hm_native'; the
masked-policy rows 'pallas'/'xla' kept for re-verification). Stage-2a is
vision-tower-dominated → sweeps MODEL_LAYOUT ('packed'/'hm'/'hm_native').
Each config re-traces the jitted step fresh (layout globals are read at
trace time). NOTE: for the *_native rows the randomly-initialized params are
simply reinterpreted as head-major — numerics differ from packed but the
compute graph (what we time) is the layout's real graph.

Prints img/s per config. Usage: python tools/bench_stages_ab.py [stage1|stage2|both]
"""

import sys

sys.path.insert(0, ".")

from mpreid_tpu.ops import attention as attn  # noqa: E402


def set_config(vision_layout, text_layout, masked_policy):
    attn.MODEL_LAYOUT = vision_layout
    attn.TEXT_LAYOUT = text_layout
    # monkeypatch the auto policy by wrapping force resolution
    attn._MASKED_POLICY = masked_policy


def patch_policy():
    """Make the auto policy read attn._MASKED_POLICY."""
    orig_hm, orig_packed = attn.fused_attention_hm, attn.fused_attention

    def hm(qkv, num_heads, mask=None, force=None):
        if force is None and mask is not None:
            force = getattr(attn, "_MASKED_POLICY", "xla")
        return orig_hm(qkv, num_heads, mask, force)

    def packed(qkv, num_heads, mask=None, force=None):
        if force is None and mask is not None:
            force = getattr(attn, "_MASKED_POLICY", "xla")
        return orig_packed(qkv, num_heads, mask, force)

    attn.fused_attention_hm = hm
    attn.fused_attention = packed


def build():
    from mpreid_tpu.utils import benchkit

    return benchkit.uniprompt_env()


def bench_stage1(cfg, model, variables):
    from mpreid_tpu.utils import benchkit

    h = benchkit.stage1_harness(cfg, model, variables)
    dt = benchkit.best_of(benchkit.epoch_window(h), windows=3)
    return h["iters"] * h["batch"] / dt


def bench_stage2(cfg, model, variables):
    from mpreid_tpu.utils import benchkit

    h = benchkit.stage2_harness(cfg, model, variables)
    iters = 20
    dt = benchkit.best_of(benchkit.step_window(h, iters=iters), windows=3)
    return iters * h["batch"]["images"].shape[0] / dt


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "both"
    patch_policy()
    cfg, model, variables = build()
    if what in ("stage1", "both"):
        for text_layout, pol in [
            ("hm_native", "pallas"),   # CURRENT DEFAULT (stored head-major)
            ("hm", "pallas"),          # superseded: in-graph permute, ~2% slower
            ("hm", "xla"),             # measured dead end (re-verification)
        ]:
            set_config("packed", text_layout, pol)
            ips = bench_stage1(cfg, model, variables)
            print(f"stage1a text={text_layout:9s} masked={pol:6s} "
                  f"{ips:7.1f} img/s", flush=True)
    if what in ("stage2", "both"):
        # hm_native is the CURRENT DEFAULT vision layout; text fixed at the
        # production default (stage-2a barely touches the text tower)
        for vision_layout in ("hm_native", "packed", "hm"):
            set_config(vision_layout, "hm_native", "pallas")
            ips = bench_stage2(cfg, model, variables)
            print(f"stage2a vision={vision_layout:9s} "
                  f"{ips:7.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
