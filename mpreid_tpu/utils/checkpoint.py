"""Checkpoint save/load via orbax.

The reference only ever saves raw ``state_dict`` weights — no optimizer,
scheduler or epoch state, so no mid-run resume exists
(ref processor/processor.py:107-114; SURVEY.md §5). Here checkpoints carry
the full TrainState (params + batch_stats + optimizer moments + epoch),
enabling true resume, while ``save_weights``/``load_weights`` keep the
reference's weights-only flow (``load_param``, ref make_model.py:118-122).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_numpy(tree: Any) -> Any:
    return jax.tree_util.tree_map(np.asarray, tree)


# ---------------------------------------------------------------------------
# attention-parameter storage layout tagging
#
# MultiHeadAttention's in_proj_kernel/bias are stored either torch-packed
# ([q|k|v] columns; layouts "packed"/"hm") or head-major (per-head
# [q_h|k_h|v_h]; layout "hm_native", the tuned default since round 3 —
# ops/attention.py). The raw arrays carry no layout information, so an
# untagged checkpoint written under one default and resumed under another
# would be silently reinterpreted — scrambled attention, no error. Saves
# therefore record the storage per tower and loads verify it against the
# active config (MODEL.ATTN_LAYOUT_{VISION,TEXT}).
# ---------------------------------------------------------------------------

_STORAGE_KEY = "attn_head_major"  # int8[2] = [visual, text]; 1 = head-major


def attn_storage_meta(cfg: Any = None) -> dict:
    """{'visual': 'packed'|'head_major', 'text': ...} for the active config
    (or the module defaults when ``cfg`` is None)."""
    from mpreid_tpu.ops.attention import resolve_layout

    v = getattr(cfg.MODEL, "ATTN_LAYOUT_VISION", "") if cfg is not None else ""
    t = getattr(cfg.MODEL, "ATTN_LAYOUT_TEXT", "") if cfg is not None else ""
    return {
        "visual": "head_major" if resolve_layout(v or None, "vision") == "hm_native" else "packed",
        "text": "head_major" if resolve_layout(t or None, "text") == "hm_native" else "packed",
    }


def _storage_tag(cfg: Any = None) -> np.ndarray:
    meta = attn_storage_meta(cfg)
    return np.asarray(
        [meta["visual"] == "head_major", meta["text"] == "head_major"], np.int8
    )


def _towers_with_in_proj(params: Any) -> dict:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    towers = {"visual": False, "text": False}
    for path, _ in flat:
        keys = [str(getattr(k, "key", k)) for k in path]
        if keys and keys[-1] == "in_proj_kernel":
            towers["text" if keys[0] == "text" else "visual"] = True
    return towers


def check_attn_storage(restored: dict, cfg: Any = None, source: str = "checkpoint") -> None:
    """Verify (and strip) the attention-storage tag of a restored tree.

    Untagged checkpoints predate head-major storage and are assumed
    torch-packed. A mismatch raises instead of silently scrambling
    attention; the remedy is loading with the matching
    ``MODEL.ATTN_LAYOUT_VISION/TEXT`` ('packed' keeps packed storage,
    'hm_native' head-major)."""
    tag = restored.pop(_STORAGE_KEY, None)
    if tag is None:
        stored = {"visual": "packed", "text": "packed"}
    else:
        arr = np.asarray(tag).astype(bool).ravel()
        stored = {
            "visual": "head_major" if arr[0] else "packed",
            "text": "head_major" if arr[1] else "packed",
        }
    expect = attn_storage_meta(cfg)
    towers = _towers_with_in_proj(restored.get("params", {}))
    bad = [t for t, present in towers.items() if present and stored[t] != expect[t]]
    if bad:
        opts = {
            "visual": "MODEL.ATTN_LAYOUT_VISION",
            "text": "MODEL.ATTN_LAYOUT_TEXT",
        }
        detail = ", ".join(
            f"{t}: stored {stored[t]!r} vs active {expect[t]!r}" for t in bad
        )
        remedy = " ".join(
            f"{opts[t]} {'hm_native' if stored[t] == 'head_major' else 'packed'}"
            for t in bad
        )
        raise ValueError(
            f"Attention-parameter storage mismatch loading {source}: {detail}. "
            f"The in_proj columns would be misinterpreted. Re-run with "
            f"`{remedy}` to match the checkpoint (see ops/attention.py)."
        )


def _nest_opt_state(opt_state) -> dict:
    # OptState.mu/nu are flat dicts keyed by PATH TUPLES; orbax round-trips
    # tuple keys as their string repr, which would break resume — nest them
    from flax import traverse_util

    return {
        "step": np.asarray(opt_state.step),
        "mu": traverse_util.unflatten_dict(_to_numpy(opt_state.mu)),
        "nu": traverse_util.unflatten_dict(_to_numpy(opt_state.nu)),
    }


def unnest_opt_state(nested: dict):
    """Inverse of checkpoint nesting → OptState with tuple-keyed flat dicts."""
    from flax import traverse_util

    from mpreid_tpu.solver.optim import OptState

    return OptState(
        step=nested["step"],
        mu=traverse_util.flatten_dict(nested["mu"]),
        nu=traverse_util.flatten_dict(nested["nu"]),
    )


# Single-slot background checkpoint writer (TPU.ASYNC_CHECKPOINT). The
# device->host fetch (_to_numpy) must stay synchronous — the very next train
# step DONATES the state's buffers — but once the payload is host numpy the
# orbax serialize+write of a GB-scale state no longer needs to stall the
# epoch loop. One slot: a new save joins the previous one first, so at most
# one writer thread ever runs and failures surface on the next save or at
# wait_for_pending_saves() (engines call it when training ends).
_PENDING_SAVE: list = []


def wait_for_pending_saves() -> None:
    """Join the in-flight async checkpoint write, re-raising its failure."""
    while _PENDING_SAVE:
        thread, path, errbox = _PENDING_SAVE.pop()
        thread.join()
        if errbox:
            raise RuntimeError(
                f"async checkpoint write to {path} failed"
            ) from errbox[0]


def save_checkpoint(path: str, state: Any, epoch: int, cfg: Any = None) -> None:
    """Save full train state (+epoch) to ``path`` (a directory).

    With ``cfg.TPU.ASYNC_CHECKPOINT`` the disk write happens on a background
    thread (the reference blocks its epoch loop on torch.save, ref
    processor.py:107-114; here only the host fetch is synchronous).
    """
    path = os.path.abspath(path)
    payload = {
        "params": _to_numpy(state.params),
        "batch_stats": _to_numpy(state.batch_stats),
        "opt_state": _nest_opt_state(state.opt_state),
        "epoch": np.asarray(epoch),
        _STORAGE_KEY: _storage_tag(cfg),
    }
    if state.centers is not None:
        payload["centers"] = np.asarray(state.centers)

    def write():
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()

    if cfg is not None and getattr(cfg.TPU, "ASYNC_CHECKPOINT", False):
        import threading

        wait_for_pending_saves()  # single slot; surfaces the prior failure
        errbox: list = []

        def guarded():
            try:
                write()
            except BaseException as e:  # re-raised at the next join
                errbox.append(e)

        thread = threading.Thread(
            target=guarded, name="mpreid-ckpt-writer", daemon=False
        )
        thread.start()
        _PENDING_SAVE.append((thread, path, errbox))
    else:
        write()


def is_torch_weight(path: str) -> bool:
    """True if ``path`` is a torch ``.pth``/``.pt`` (reference-trained)
    checkpoint rather than an orbax directory."""
    return str(path).endswith((".pth", ".pt"))


def _device_put_tree(tree: Any) -> Any:
    # orbax restores host numpy arrays; as jit arguments those would be
    # re-transferred on EVERY call (600 MB/step over a remote TPU link) —
    # commit them to device memory once here
    return jax.tree_util.tree_map(jax.device_put, tree)


def load_checkpoint(path: str, cfg: Any = None) -> dict:
    """Restore a full train-state checkpoint as device-resident arrays.

    NOTE: the returned arrays may be donated (consumed) by the jitted train
    steps — do not keep reading the returned dict after stepping a state
    built from it.
    """
    wait_for_pending_saves()  # the path may still be mid-write
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path))
    check_attn_storage(restored, cfg, source=path)
    return _device_put_tree(restored)


def save_weights(path: str, params: Any, batch_stats: Any = None,
                 cfg: Any = None) -> None:
    """Weights-only save (the reference's torch.save(state_dict()) analogue)."""
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": _to_numpy(params), _STORAGE_KEY: _storage_tag(cfg)}
    if batch_stats:
        payload["batch_stats"] = _to_numpy(batch_stats)
    ckptr.save(os.path.abspath(path), payload, force=True)
    ckptr.wait_until_finished()


def load_weights(path: str, variables: dict, cfg: Any = None) -> dict:
    """Load weights into an existing variable tree (ref load_param:118-122).

    Arrays are matched by tree position; missing collections are kept from
    the input tree.
    """
    wait_for_pending_saves()  # the path may still be mid-write
    restored = ocp.StandardCheckpointer().restore(os.path.abspath(path))
    check_attn_storage(restored, cfg, source=path)
    restored = _device_put_tree(restored)
    out = dict(variables)
    out["params"] = restored["params"]
    if "batch_stats" in restored:
        out["batch_stats"] = restored["batch_stats"]
    return out
