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


def save_checkpoint(path: str, state: Any, epoch: int) -> None:
    """Save full train state (+epoch) to ``path`` (a directory)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": _to_numpy(state.params),
        "batch_stats": _to_numpy(state.batch_stats),
        "opt_state": _nest_opt_state(state.opt_state),
        "epoch": np.asarray(epoch),
    }
    if state.centers is not None:
        payload["centers"] = np.asarray(state.centers)
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def is_torch_weight(path: str) -> bool:
    """True if ``path`` is a torch ``.pth``/``.pt`` (reference-trained)
    checkpoint rather than an orbax directory."""
    return str(path).endswith((".pth", ".pt"))


def _device_put_tree(tree: Any) -> Any:
    # orbax restores host numpy arrays; as jit arguments those would be
    # re-transferred on EVERY call (600 MB/step over a remote TPU link) —
    # commit them to device memory once here
    return jax.tree_util.tree_map(jax.device_put, tree)


def load_checkpoint(path: str) -> dict:
    """Restore a full train-state checkpoint as device-resident arrays.

    NOTE: the returned arrays may be donated (consumed) by the jitted train
    steps — do not keep reading the returned dict after stepping a state
    built from it.
    """
    ckptr = ocp.StandardCheckpointer()
    return _device_put_tree(ckptr.restore(os.path.abspath(path)))


def save_weights(path: str, params: Any, batch_stats: Any = None) -> None:
    """Weights-only save (the reference's torch.save(state_dict()) analogue)."""
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": _to_numpy(params)}
    if batch_stats:
        payload["batch_stats"] = _to_numpy(batch_stats)
    ckptr.save(os.path.abspath(path), payload, force=True)
    ckptr.wait_until_finished()


def load_weights(path: str, variables: dict) -> dict:
    """Load weights into an existing variable tree (ref load_param:118-122).

    Arrays are matched by tree position; missing collections are kept from
    the input tree.
    """
    restored = _device_put_tree(
        ocp.StandardCheckpointer().restore(os.path.abspath(path))
    )
    out = dict(variables)
    out["params"] = restored["params"]
    if "batch_stats" in restored:
        out["batch_stats"] = restored["batch_stats"]
    return out
