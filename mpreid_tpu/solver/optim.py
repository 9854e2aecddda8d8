"""Optimizers with the reference's per-parameter-group semantics.

The reference builds one torch param-group per parameter, varying lr and
weight decay by name (``solver/make_optimizer.py:3-28``,
``make_optimizer_prompt.py:38-209``):

  * params named ``*bias*`` get ``BASE_LR × BIAS_LR_FACTOR`` and
    ``WEIGHT_DECAY_BIAS``,
  * with ``LARGE_FC_LR``, classifier params get 2× lr,
  * each training stage freezes a different subset by name substring.

Here that becomes three pytrees over the params — lr multiplier, weight
decay, trainable mask — driving a single jitted update. Weight decay is
*coupled* L2 (added to the gradient) for Adam/SGD exactly like torch, and
decoupled for AdamW. The scalar base LR is an argument of ``update`` so the
per-epoch schedules (solver/schedules.py) never trigger recompilation.

Stage freeze policies (``stage_trainable``) mirror:
  * stage1a / stage1b — ``enable_stage1a/1b_training``
    (ref make_model_uniprompt.py:138-157): only the generic / the
    modality+platform prompt contexts train,
  * stage2a — everything except text encoder, experts and prompt learner
    (ref make_optimizer_prompt.py:60-109 + train_uniprompt.py:137-155),
  * stage2b — only MoE gates and the image encoder minus experts
    (ref make_optimizer_prompt.py:111-152),
  * baseline — everything.
The BNNeck bias is frozen in every stage (ref make_model.py:54,57).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# path utilities
# ---------------------------------------------------------------------------

def path_strings(params) -> Any:
    """Pytree of '/'-joined path strings, one per leaf."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    names = [
        "/".join(str(getattr(k, "key", k)) for k in path) for path, _ in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, names)


def _tree_from_predicate(params, fn: Callable[[str], Any]) -> Any:
    return jax.tree_util.tree_map(fn, path_strings(params))


def is_bias(name: str) -> bool:
    return "bias" in name.split("/")[-1]


def is_classifier(name: str) -> bool:
    return "classifier" in name


def bnneck_bias(name: str) -> bool:
    parts = name.split("/")
    return parts[0] in ("bottleneck", "bottleneck_proj") and parts[-1] == "bias"


def stage_trainable(params, stage: str) -> Any:
    """Boolean pytree of trainable leaves for a training stage."""

    def pred(name: str) -> bool:
        if bnneck_bias(name):
            return False
        if stage == "baseline" or stage == "stage2" or stage is None:
            return True
        if stage == "stage1a":
            return name.endswith("ctx_generic")
        if stage == "stage1b":
            return name.endswith("ctx_modality") or name.endswith("ctx_platform")
        if stage == "lora":
            return "lora" in name.split("/")[-1]
        if stage == "stage2a":
            parts = name.split("/")
            if parts[0] == "text" or "expert" in name or parts[0] == "prompt_learner":
                return False
            return True
        if stage == "stage2b":
            if "gate" in name:
                return True
            parts = name.split("/")
            return parts[0] == "visual" and "experts" not in name
        raise ValueError(f"Unknown stage {stage!r}")

    return _tree_from_predicate(params, pred)


def group_trees(params, stage_cfg) -> Tuple[Any, Any]:
    """(lr_multiplier, weight_decay) pytrees from the stage's solver block."""
    bias_factor = getattr(stage_cfg, "BIAS_LR_FACTOR", 1)
    large_fc = getattr(stage_cfg, "LARGE_FC_LR", False)
    wd = stage_cfg.WEIGHT_DECAY
    wd_bias = stage_cfg.WEIGHT_DECAY_BIAS

    def lr_mult(name: str) -> float:
        m = 1.0
        if is_bias(name):
            m = float(bias_factor)
        if large_fc and is_classifier(name):
            m = 2.0
        return m

    def decay(name: str) -> float:
        return float(wd_bias if is_bias(name) else wd)

    return _tree_from_predicate(params, lr_mult), _tree_from_predicate(params, decay)


# ---------------------------------------------------------------------------
# optimizer cores (torch-semantics) over the *trainable partition*
# ---------------------------------------------------------------------------

class OptState(NamedTuple):
    step: jax.Array
    mu: Any        # first moment / momentum buffer (trainable subset)
    nu: Any        # second moment (Adam family; trainable subset)


def _flatten(params) -> Dict[tuple, Any]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return {
        tuple(str(getattr(k, "key", k)) for k in path): leaf for path, leaf in flat
    }


def _unflatten(flat: Dict[tuple, Any]):
    from flax import traverse_util

    return traverse_util.unflatten_dict(flat)


class Optimizer:
    """SGD / Adam / AdamW with per-leaf lr-mult and wd, torch semantics.

    Frozen parameters are *partitioned out*, not masked: gradients are only
    taken w.r.t. the trainable subset and optimizer moments exist only for
    it. For prompt-tuning stages (a few thousand trainable weights inside a
    150M-param model) this removes ~GBs of per-step HBM traffic that a
    masked-update formulation would spend rewriting frozen Adam moments.

    API: ``partition(params) → (train, frozen)`` flat dicts;
    ``merge(train, frozen) → params``; ``init(params)``;
    ``update(grads, state, train, lr) → (new_train, new_state)``.
    """

    def __init__(
        self,
        name: str,
        params,
        stage_cfg,
        stage: Optional[str] = None,
        trainable: Optional[Any] = None,
        b1: float = 0.9,
        b2: float = 0.999,
        eps: float = 1e-8,
    ):
        self.name = name
        self.b1, self.b2, self.eps = b1, b2, eps
        self.momentum = getattr(stage_cfg, "MOMENTUM", 0.9)
        # Moment STORAGE dtype. "bfloat16" halves the optimizer-state HBM
        # traffic (the Adam update is bandwidth-bound: ~4.7 ms / 513 GB/s
        # for 87M trainable params on the v5e); the moment update and the
        # step math still run in fp32 — only what is written back to HBM is
        # rounded. torch-exact parity requires the fp32 default.
        md = getattr(stage_cfg, "MOMENT_DTYPE", "float32")
        if md not in ("float32", "bfloat16"):
            raise ValueError(
                f"MOMENT_DTYPE must be 'float32' or 'bfloat16', got {md!r}"
            )
        self.moment_dtype = jnp.bfloat16 if md == "bfloat16" else jnp.float32
        # Fused Pallas param+moment update for large Adam/AdamW leaves —
        # HBM-bound lane of the stage-2 step (ops/adam_kernel.py). Single
        # REAL device only: GSPMD cannot partition the custom call, so any
        # multi-device program (DP/ZeRO/TP — sharded moments) takes the XLA
        # path automatically.
        self.fused_adam = bool(getattr(stage_cfg, "FUSED_ADAM", True))
        self.trainable = (
            trainable if trainable is not None else stage_trainable(params, stage)
        )
        self._trainable_flat = _flatten(self.trainable)
        lr_mult, wd = group_trees(params, stage_cfg)
        self.lr_mult = {
            k: v for k, v in _flatten(lr_mult).items() if self._trainable_flat[k]
        }
        self.wd = {k: v for k, v in _flatten(wd).items() if self._trainable_flat[k]}

    # -- partitioning -------------------------------------------------------
    def partition(self, params) -> Tuple[Dict, Dict]:
        flat = _flatten(params)
        train = {k: v for k, v in flat.items() if self._trainable_flat[k]}
        frozen = {k: v for k, v in flat.items() if not self._trainable_flat[k]}
        return train, frozen

    @staticmethod
    def merge(train: Dict, frozen: Dict):
        return _unflatten({**frozen, **train})

    # -- optimizer ----------------------------------------------------------
    def init(self, params) -> OptState:
        train, _ = self.partition(params)

        def zeros(p):
            # zeros_like (not zeros) so the moment inherits the parameter's
            # sharding — TP/EP-sharded leaves must not materialize fully
            # replicated moments on one device at init.
            return jnp.zeros_like(p, dtype=self.moment_dtype)

        return OptState(
            step=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(zeros, train),
            nu=jax.tree_util.tree_map(zeros, train),
        )

    def _fused_active(self) -> bool:
        """Fused kernel only for single-real-device TPU programs (trace-time
        decision; CPU meshes / multi-chip always take the XLA path)."""
        if not self.fused_adam:
            return False
        from mpreid_tpu.ops.pallas_kernels import _on_tpu

        return _on_tpu() and jax.device_count() == 1

    def update(self, grads: Dict, state: OptState, train: Dict, lr
               ) -> Tuple[Dict, OptState]:
        t = state.step + 1
        decoupled = self.name == "AdamW"
        md = self.moment_dtype

        if self.name == "SGD":
            # coupled L2 (torch SGD semantics)
            grads = jax.tree_util.tree_map(
                lambda g, p, w: g + w * p, grads, train, self.wd
            )
            # moment math in fp32, storage in moment_dtype (no-op for fp32)
            mu32 = jax.tree_util.tree_map(
                lambda b, g: self.momentum * b.astype(jnp.float32) + g,
                state.mu, grads,
            )
            steps = jax.tree_util.tree_map(lambda b, m: lr * m * b, mu32, self.lr_mult)
            mu = jax.tree_util.tree_map(lambda m: m.astype(md), mu32)
            nu = state.nu
            new_train = jax.tree_util.tree_map(lambda p, s: p - s, train, steps)
            return new_train, OptState(step=t, mu=mu, nu=nu)

        if self.name not in ("Adam", "AdamW"):
            raise ValueError(f"Unsupported optimizer {self.name!r}")

        bc1 = 1 - self.b1 ** t.astype(jnp.float32)
        bc2 = 1 - self.b2 ** t.astype(jnp.float32)
        use_fused = self._fused_active()
        if use_fused:
            from mpreid_tpu.ops.adam_kernel import (
                MIN_FUSED_SIZE, fused_adam_leaf,
            )

        new_train, mu, nu = {}, {}, {}
        for k, p in train.items():
            g, w, mult = grads[k], self.wd[k], self.lr_mult[k]
            m0, v0 = state.mu[k], state.nu[k]
            if use_fused and p.size >= MIN_FUSED_SIZE:
                scalars = jnp.stack(
                    [jnp.asarray(lr * mult, jnp.float32), bc1, bc2]
                )
                p1, m1, v1 = fused_adam_leaf(
                    p, m0, v0, g, scalars, self.b1, self.b2, self.eps,
                    w, decoupled, md,
                )
                new_train[k], mu[k], nu[k] = p1, m1, v1
                continue
            # XLA path — identical math, per leaf
            if not decoupled:
                g = g + w * p          # coupled L2 (torch Adam)
            m32 = self.b1 * m0.astype(jnp.float32) + (1 - self.b1) * g
            v32 = (self.b2 * v0.astype(jnp.float32)
                   + (1 - self.b2) * jnp.square(g))
            # the step uses the fresh fp32 moments (pre-rounding)
            step = lr * mult * (m32 / bc1) / (jnp.sqrt(v32 / bc2) + self.eps)
            if decoupled:
                # torch AdamW decays with the per-group lr (lr * multiplier)
                step = step + lr * mult * w * p
            new_train[k] = p - step
            mu[k] = m32.astype(md)
            nu[k] = v32.astype(md)
        return new_train, OptState(step=t, mu=mu, nu=nu)


def make_optimizer(cfg_stage, params, stage: Optional[str] = None,
                   trainable: Optional[Any] = None) -> Optimizer:
    """Build the stage optimizer (ref make_optimizer*.py dispatch)."""
    return Optimizer(cfg_stage.OPTIMIZER_NAME, params, cfg_stage, stage, trainable)


class CenterOptimizer:
    """Plain SGD on the center-loss centers.

    The reference rescales the center gradients by 1/CENTER_LOSS_WEIGHT
    before stepping a dedicated SGD(lr=CENTER_LR)
    (ref processor/processor.py:80-84, make_optimizer.py:26).
    """

    def __init__(self, lr: float, loss_weight: float):
        self.lr = lr
        self.loss_weight = loss_weight

    def update(self, grad: jax.Array, centers: jax.Array) -> jax.Array:
        return centers - self.lr * (grad / self.loss_weight)
