import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mpreid_tpu.config import get_default_cfg
from mpreid_tpu.models.reid import ReIDModel
from mpreid_tpu.solver import Optimizer, stage_trainable

from tiny import tiny_cfg, tiny_clip_config


def build(lora_rank):
    cc = tiny_clip_config(lora_rank=lora_rank)
    m = ReIDModel(clip_config=cc, num_classes=4)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 16, 3)),
               jnp.zeros((2,), jnp.int32), train=True)
    return m, v


def test_disabled_lora_keeps_param_surface():
    _, v = build(0)
    attn = v["params"]["visual"]["resblocks_0"]["attn"]
    assert "lora_a" not in attn and "lora_b" not in attn


def test_lora_zero_init_is_identity():
    m0, v0 = build(0)
    m4, v4 = build(4)
    # graft the base weights of the no-lora model into the lora model
    import flax

    v4 = flax.core.unfreeze(v4)

    def graft(dst, src):
        for k, val in src.items():
            if isinstance(val, dict):
                graft(dst[k], val)
            else:
                dst[k] = val

    graft(v4["params"], flax.core.unfreeze(v0)["params"])
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 16, 3))
    f0 = m0.apply(v0, x, train=False)
    f4 = m4.apply(v4, x, train=False)
    # lora_b is zero-initialized → adapter contributes nothing at init
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f4), atol=1e-6)


def test_lora_stage_trains_only_adapters():
    m, v = build(4)
    cfg = get_default_cfg()
    opt = Optimizer("Adam", v["params"], cfg.SOLVER.LORA, stage="lora")
    train, frozen = opt.partition(v["params"])
    assert train and all(k[-1].startswith("lora") for k in train)
    assert all(not k[-1].startswith("lora") for k in frozen)

    # one grad step through the model moves only the adapters
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 32, 16, 3))
    labels = jnp.array([0, 1, 2, 3])

    def loss(train_sub):
        params = opt.merge(train_sub, frozen)
        out, _ = m.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, labels, train=True, mutable=["batch_stats"],
        )
        return jnp.mean(jnp.square(out["scores"][0]))

    g = jax.grad(loss)(train)
    state = opt.init(v["params"])
    new_train, _ = opt.update(g, state, train, 1e-2)
    moved = [k for k in new_train
             if not np.allclose(np.asarray(new_train[k]), np.asarray(train[k]))]
    assert moved  # lora_a participates; lora_b gets grads once a≠0 output flows
