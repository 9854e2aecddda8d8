"""Functional training state.

The reference's training state is scattered across a torch module, two
optimizers and a scheduler; here it's a single pytree threaded through a
jitted step (SURVEY.md §7 design stance).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    centers: Optional[Any] = None


def initial_state(variables, optimizer, centers=None) -> TrainState:
    return TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(variables["params"]),
        centers=centers,
    )
