"""Device mesh and sharding rules.

The reference's distribution story is NCCL process groups + DataParallel
(SURVEY.md §2.3) — none of which maps to TPU. Here a single
``jax.sharding.Mesh`` with axes ``('data', 'model')`` covers every strategy
this workload needs:

  * **DP** — batches sharded over ``data``,
  * **TP** — classifier kernels (num_classes axis) sharded over ``model``,
  * **EP** — stacked MoE expert tensors sharded over ``model`` (their
    leading axis is the expert axis),
  * **gallery/sequence sharding** — eval features sharded over ``data``
    (the long axis of this workload is the gallery, SURVEY.md §5).

Everything else replicates; XLA inserts the psum/all-gather collectives over
ICI during pjit compilation.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None) -> int:
    """Multi-host initialization (the NCCL init_process_group analogue,
    ref train.py:61-62). No-op for single-process runs; on a TPU pod slice
    the args come from the environment automatically. Returns process index.
    """
    import jax

    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index()


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def mesh_from_cfg(cfg, devices=None) -> Mesh:
    return make_mesh(cfg.TPU.MESH_DATA, cfg.TPU.MESH_MODEL, devices)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_spec(path: str, tp_towers: bool = False) -> P:
    """PartitionSpec for one parameter, by path string.

    TP: classifier kernels (in, num_classes) shard the class axis.
    EP: expert tensors (E, ...) shard the expert axis.

    With ``tp_towers`` (``TPU.TP_TOWERS``), the transformer towers themselves
    are Megatron-style tensor-parallel over 'model' (Shoeybi et al. 2019 —
    the public recipe; the reference has no TP at all, SURVEY.md §2.3):

      * QKV projection column-parallel — ``in_proj_kernel`` (d, 3d) shards
        its output columns, ``in_proj_bias`` (3d,) follows. Under the
        default head-major ("hm_native") storage the columns are grouped
        per head, so a 'model' axis that divides num_heads shards whole
        heads — each shard computes its heads' attention locally.
      * attention output row-parallel — ``out_proj_kernel`` (d, d) shards
        its input rows; GSPMD closes the partial sums with one psum.
      * MLP ``c_fc`` column-parallel / ``c_proj`` row-parallel, the classic
        pairing that needs no collective between the two matmuls.

    Expressed purely as placements: GSPMD propagates the shardings through
    the einsums and inserts the ICI collectives. Everything not matched
    (LayerNorms, embeddings, conv patchify, lora_a) replicates.
    """
    parts = path.split("/")
    if "classifier" in parts[0] and parts[-1] == "kernel":
        return P(None, "model")
    if "experts" in parts and parts[-1].startswith("c_"):
        return P("model")
    if parts[-1] == "ctx_generic":
        # per-identity prompt contexts scale with num_classes — shard them
        return P("model")
    if tp_towers and "experts" not in parts:
        leaf, parent = parts[-1], parts[-2] if len(parts) >= 2 else ""
        if leaf in ("in_proj_kernel", "lora_b"):
            return P(None, "model")   # column-parallel QKV (+ its adapter)
        if leaf == "in_proj_bias":
            return P("model")
        if leaf == "out_proj_kernel":
            return P("model", None)   # row-parallel: partial sums -> psum
        if parent == "c_fc":
            return P(None, "model") if leaf == "kernel" else P("model")
        if parent == "c_proj" and leaf == "kernel":
            return P("model", None)
    return P()


def shard_variables(variables: Any, mesh: Mesh, tp_towers: bool = False) -> Any:
    """Place a variable tree on the mesh per ``param_spec``.

    With ``tp_towers`` this also arms the attention TP interlock
    (``ops.attention.set_tp_sharded_towers``): the Pallas fused-MHA custom
    call is not GSPMD-partitionable over the now-'model'-sharded head axis,
    so every subsequent ``force=None`` attention call auto-selects the XLA
    einsum path — on TPU and CPU alike. The flag is sticky by design: a
    later non-TP ``shard_variables`` call (e.g. eval placement in the same
    session) must not re-enable the fused kernel while TP-sharded params
    are still live. Tests reset via ``set_tp_sharded_towers(False)``.
    """
    if tp_towers:
        from mpreid_tpu.ops.attention import set_tp_sharded_towers

        set_tp_sharded_towers(True)
    from mpreid_tpu.solver.optim import path_strings

    def place(subtree):
        names = path_strings(subtree)
        return jax.tree_util.tree_map(
            lambda x, n: jax.device_put(
                x, NamedSharding(mesh, param_spec(n, tp_towers))
            ),
            subtree,
            names,
        )

    return {k: place(v) for k, v in variables.items()}


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Put array leaves with the leading (batch) axis sharded over 'data'."""
    sh = batch_sharding(mesh)

    def place(x):
        if hasattr(x, "ndim") and getattr(x, "ndim", 0) >= 1:
            return jax.device_put(np.asarray(x), sh)
        return x

    return jax.tree_util.tree_map(place, batch)
