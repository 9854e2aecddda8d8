import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mpreid_tpu.models import make_model_uniprompt, init_variables, switch_to_moe
from mpreid_tpu.models.uniprompt import UniPromptReID

from tiny import tiny_cfg, tiny_model


def moe_cfg():
    cfg = tiny_cfg()
    cfg.MODEL.MOE.ENABLED = True
    cfg.MODEL.MOE.NUM_EXPERTS = 2
    cfg.MODEL.MOE.TOP_K = 1
    cfg.MODEL.MOE.MOE_LAYERS = 1
    return cfg


def test_switch_grafts_dense_weights():
    cfg = moe_cfg()
    model, variables = tiny_model(cfg, num_classes=4, uniprompt=True)
    assert model.clip_config.num_experts == 0  # tiny_model builds dense

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 16, 3))
    f_dense = model.apply(variables, x, train=False)

    moe_model, moe_vars = switch_to_moe(cfg, model, variables)
    assert moe_model.clip_config.num_experts == 2
    vis = moe_vars["params"]["visual"]
    assert "moe_resblocks_0" in vis and "resblocks_1" in vis
    # experts initialized from the dense MLP (both identical), gate zero →
    # top-1 of uniform routing picks one expert whose MLP equals the dense
    # one, so the forward is numerically unchanged
    f_moe = moe_model.apply(moe_vars, x, train=False)
    np.testing.assert_allclose(np.asarray(f_dense), np.asarray(f_moe),
                               rtol=1e-4, atol=1e-5)


def test_switch_is_idempotent():
    cfg = moe_cfg()
    model, variables = tiny_model(cfg, num_classes=4, uniprompt=True)
    m1, v1 = switch_to_moe(cfg, model, variables)
    m2, v2 = switch_to_moe(cfg, m1, v1)
    assert m2 is m1 and v2 is v1


def test_switch_noop_when_disabled():
    cfg = tiny_cfg()
    model, variables = tiny_model(cfg, num_classes=4, uniprompt=True)
    m, v = switch_to_moe(cfg, model, variables)
    assert m is model and v is variables
