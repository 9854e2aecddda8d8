"""GPipe-style pipeline parallelism (PP) for the transformer towers.

The reference has no pipeline analogue — its only model parallelism is
``nn.DataParallel`` scatter/gather (ref ``processor/processor.py:33-35``).
This is TPU-native capability beyond it, completing the mesh strategy set
(DP/TP/EP/ZeRO-1/gallery-sharding, docs/PARALLELISM.md) with the axis that
matters once a tower no longer fits one device's HBM: contiguous groups of
residual blocks ("stages") live on different devices of a 1-D ``('pipe',)``
mesh and microbatches stream through them.

Design (all-XLA, no hand-written communication):

* **Stage-sharded parameters.** The per-block param subtrees
  (``resblocks_i``, identical structure) are stacked into one tree whose
  leaves carry leading axes ``(S, L/S, …)`` and sharded ``P('pipe')`` on the
  stage axis — each device stores ONLY its own stage's blocks, the PP memory
  win. Inside a stage the ``L/S`` blocks run as one ``lax.scan``.
* **Fill-drain schedule.** With M microbatches and S stages the pipeline
  runs ``T = M + S - 1`` ticks; at tick ``t`` stage ``s`` computes microbatch
  ``t - s``. Stage 0 injects microbatch ``t``; activations hop to the next
  stage via ``lax.ppermute``. The last stage accumulates its outputs, a
  final ``psum`` over the (zeros-elsewhere) output buffer replicates the
  result. Bubble fraction is the standard ``(S-1)/(M+S-1)``.
* **Differentiable end-to-end.** ``ppermute``/``scan``/``where`` have exact
  VJPs, so ``jax.grad`` through the pipelined tower equals the sequential
  tower's gradients — pinned by ``tests/test_pipeline.py``, forward and
  backward, against the block-sequential reference.

Not enabled at ViT-B/16 scale (12 blocks fit one chip many times over; DP
is strictly better — the bubble and the per-tick ppermute buy nothing).
The machinery targets deeper/wider towers (ViT-L/14's 24, ViT-H's 32
blocks) and composes with DP on a 2-D ``('data','pipe')`` mesh by vmapping
or batch-shardng the replicated input axis.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def pipe_mesh(n_stages: int, devices=None) -> Mesh:
    """A 1-D ``('pipe',)`` mesh over ``n_stages`` devices."""
    devices = devices if devices is not None else jax.devices()
    if len(devices) < n_stages:
        raise ValueError(f"{n_stages} stages > {len(devices)} devices")
    return Mesh(np.asarray(devices[:n_stages]), ("pipe",))


def stack_block_params(params: Dict[str, Any], n_layers: int, n_stages: int,
                       prefix: str = "resblocks_") -> Any:
    """``{prefix}{i}`` subtrees → one stacked tree, leaves ``(S, L/S, …)``.

    Requires ``n_layers % n_stages == 0`` (contiguous equal stages — the
    layout that balances per-stage compute for identical blocks).
    """
    if n_layers % n_stages:
        raise ValueError(f"{n_layers} blocks not divisible into {n_stages} stages")
    per = n_layers // n_stages
    blocks = [params[f"{prefix}{i}"] for i in range(n_layers)]
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves).reshape(
            (n_stages, per) + np.shape(leaves[0])
        ),
        *blocks,
    )


def unstack_block_params(stacked: Any, prefix: str = "resblocks_") -> Dict[str, Any]:
    """Inverse of :func:`stack_block_params` (stage-major block order)."""
    leaf = jax.tree_util.tree_leaves(stacked)[0]
    s, per = leaf.shape[0], leaf.shape[1]
    out: Dict[str, Any] = {}
    for i in range(s * per):
        out[f"{prefix}{i}"] = jax.tree_util.tree_map(
            lambda l: l[i // per, i % per], stacked
        )
    return out


def gpipe_apply(block_apply: Callable[[Any, jax.Array], jax.Array],
                stacked_params: Any, x: jax.Array, mesh: Mesh,
                microbatches: Optional[int] = None,
                axis_name: str = "pipe",
                batch_axis: Optional[str] = None,
                remat: bool = False) -> jax.Array:
    """Apply ``S × L/S`` blocks to ``x`` (batch-leading) under GPipe.

    ``block_apply(block_params, h) -> h`` is one block on one microbatch;
    ``stacked_params`` comes from :func:`stack_block_params` and is sharded
    ``P(axis_name)`` on its stage axis (pass it placed or let GSPMD move
    it). Exactly equal to applying the blocks sequentially: microbatching
    is exact for per-sample block math (LN/attention never mix samples).

    ``batch_axis`` composes PP with DP on a 2-D mesh (e.g.
    ``('data', 'pipe')``): each microbatch's sample axis shards over it, so
    every data column runs its own independent pipeline over the shared
    stage-sharded params — ppermute/psum ride only the pipe axis.

    ``remat=True`` wraps each stage in ``jax.checkpoint`` — GPipe's standard
    memory form: the backward pass recomputes stage activations per
    microbatch instead of keeping all ``M × L`` block activations live,
    exactly the trade a deep tower needs (same gradients, more FLOPs).
    """
    n_stages = mesh.shape[axis_name]
    b = x.shape[0]
    m = microbatches if microbatches is not None else min(b, 2 * n_stages)
    if b % m:
        raise ValueError(f"batch {b} not divisible into {m} microbatches")
    if batch_axis is not None and (b // m) % mesh.shape[batch_axis]:
        raise ValueError(
            f"microbatch {b // m} not divisible over '{batch_axis}' "
            f"({mesh.shape[batch_axis]} shards)"
        )
    x_mb = x.reshape((m, b // m) + x.shape[1:])
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def pipelined(stacked, x_mb):
        # local views: stacked leaves (1, L/S, …); x_mb replicated
        stage_params = jax.tree_util.tree_map(lambda l: l[0], stacked)
        s_idx = jax.lax.axis_index(axis_name)

        def stage_fn(h):
            def body(carry, p):
                return block_apply(p, carry), None
            out, _ = jax.lax.scan(body, h, stage_params)
            return out

        if remat:
            stage_fn = jax.checkpoint(stage_fn)

        def tick(carry, t):
            recv, out = carry
            inj = jnp.take(x_mb, jnp.minimum(t, m - 1), axis=0)
            h = stage_fn(jnp.where(s_idx == 0, inj, recv))
            # the last stage lands microbatch t-(S-1) at tick t
            widx = jnp.clip(t - (n_stages - 1), 0, m - 1)
            keep = jax.lax.dynamic_index_in_dim(out, widx, 0, keepdims=False)
            write = jnp.logical_and(s_idx == n_stages - 1, t >= n_stages - 1)
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(write, h, keep), widx, 0
            )
            if n_stages == 1:
                return (recv, out), None
            return (jax.lax.ppermute(h, axis_name, perm), out), None

        zero_mb = jnp.zeros(x_mb.shape[1:], x_mb.dtype)
        (_, out), _ = jax.lax.scan(
            tick, (zero_mb, jnp.zeros_like(x_mb)),
            jnp.arange(m + n_stages - 1),
        )
        # out is the real outputs on the last stage, zeros elsewhere —
        # psum (exact: x + 0) replicates the result across stages
        return jax.lax.psum(out, axis_name)

    data_spec = P(None, batch_axis) if batch_axis is not None else P()
    fn = shard_map(
        pipelined, mesh=mesh,
        in_specs=(P(axis_name), data_spec), out_specs=data_spec,
        check_vma=False,  # stage-varying intermediates by construction
    )
    # jit required: remat's closed_call can't evaluate eagerly inside
    # shard_map, and the production path is always jitted anyway
    out = jax.jit(fn)(stacked_params, x_mb)
    return out.reshape((b,) + x.shape[1:])


def pipelined_blocks(block_module, params: Dict[str, Any], n_layers: int,
                     x: jax.Array, mesh: Mesh,
                     microbatches: Optional[int] = None,
                     mask: Optional[jax.Array] = None,
                     prefix: str = "resblocks_",
                     axis_name: str = "pipe",
                     batch_axis: Optional[str] = None) -> jax.Array:
    """Run a tower's ``{prefix}{i}`` blocks (a flax module applied per
    block, e.g. ``models.layers.ResidualAttentionBlock``) under GPipe."""
    stacked = stack_block_params(params, n_layers, mesh.shape[axis_name], prefix)

    def apply_one(p, h):
        return block_module.apply({"params": p}, h, mask)

    return gpipe_apply(apply_one, stacked, x, mesh,
                       microbatches=microbatches, axis_name=axis_name,
                       batch_axis=batch_axis)
