"""Micro-benchmark: packed vs head-major fused-MHA kernels on the TPU.

Times a scan-chained loop (data dependency between iterations, single
dispatch — the tunnel adds ~20 ms per fetch, see CLAUDE.md) of forward and
forward+backward at the two in-model shapes:

  * vision tower, stage-2 train: B=64, L=129, D=768, H=12, bf16, no mask
  * text tower: B=64, L=77, D=512, H=8, bf16, causal mask

Usage: python tools/bench_attention.py [iters]
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from mpreid_tpu.ops import attention as A  # noqa: E402


def timed_scan(fn, args, iters):
    """One compiled scan chaining fn; returns sec/iter."""

    @jax.jit
    def run(x):
        def body(c, _):
            y = fn(c)
            # thread a data dependency that touches every output element
            c = c * (1.0 + 1e-12 * jnp.sum(y).astype(c.dtype))
            return c, ()

        c, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(c)

    r = run(args)
    float(r)  # warmup + compile
    t0 = time.perf_counter()
    float(run(args))
    return (time.perf_counter() - t0) / iters


def bench_case(name, b, l, d, h, use_mask, iters, which=("packed", "hm")):
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(b, l, 3 * d).astype(np.float32),
                      dtype=jnp.bfloat16)
    mask = (jnp.asarray(np.triu(np.full((l, l), -1e9, np.float32), 1))
            if use_mask else None)
    flops_fwd = 2 * 2 * b * h * l * l * (d // h)  # scores + values matmuls
    results = {}

    def fwd_packed(q):
        return A.fused_attention(q, h, mask, force="pallas")

    def fwd_hm(q):
        return A.fused_attention_hm(q, h, mask, force="pallas")

    def grad_of(f):
        g = jax.grad(lambda q: jnp.sum(f(q).astype(jnp.float32)))
        return g

    def fwd_xla(q):
        return A.fused_attention(q, h, mask, force="xla")

    def fwd_xla_hm(q):
        return A.fused_attention_hm(q, h, mask, force="xla")

    for label, f in (("packed", fwd_packed), ("hm", fwd_hm),
                     ("xla", fwd_xla), ("xla_hm", fwd_xla_hm)):
        if label not in which:
            continue
        tf = timed_scan(f, qkv, iters)
        tg = timed_scan(grad_of(f), qkv, iters)
        results[label] = (tf, tg)
        print(
            f"{name:18s} {label:7s} BT_HM={A._BT_HM_FWD:3d}/{A._BT_HM_BWD:3d} HG={A._HG_HM_FWD}/{A._HG_HM_BWD} "
            f"fwd {tf*1e3:7.3f} ms ({flops_fwd/tf/1e12:6.1f} TF/s)   "
            f"fwd+bwd {tg*1e3:7.3f} ms",
            flush=True,
        )
    return results


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    print("devices:", jax.devices(), flush=True)
    only = sys.argv[2] if len(sys.argv) > 2 else None
    variants = [(8, 2), (16, 2), (32, 2), (16, 4)]
    if only in ("packed", "hm", "xla", "xla_hm"):
        bench_case("vision B64 L129", 64, 129, 768, 12, False, iters,
                   which=(only,))
        bench_case("text   B64 L77 ", 64, 77, 512, 8, True, iters,
                   which=(only,))
        return
    for bt, hg in variants:
        A._BT_HM_FWD = A._BT_HM_BWD = bt
        A._HG_HM_FWD = A._HG_HM_BWD = hg
        bench_case("vision B64 L129", 64, 129, 768, 12, False, iters,
                   which=("hm",))
    A._BT_HM_FWD = A._BT_HM_BWD = 16
    A._HG_HM_FWD = A._HG_HM_BWD = 2
    bench_case("text   B64 L77 ", 64, 77, 512, 8, True, iters, which=("hm",))


if __name__ == "__main__":
    main()
