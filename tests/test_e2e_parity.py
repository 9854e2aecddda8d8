"""End-to-end pipeline parity against the reference PyTorch framework.

Runs the reference's ACTUAL pipeline math — its model modules
(``model/make_model.py``, ``model/make_model_uniprompt.py``), loss factory
(``loss/make_loss.py``), optimizers (``solver/make_optimizer*.py``) and
metrics (``utils/metrics.py``) — side by side with this framework on
identical synthetic data and identical initial weights, asserting per-step
training-loss agreement and CMC/mAP equality.

Only the reference's environment glue is neutralized, never its math:
  * ``Tensor.cuda`` / ``Module.to("cuda")`` become no-ops (CPU-only torch),
  * ``load_clip_to_cpu`` is monkeypatched to build from a seeded synthetic
    state_dict through the reference's own ``clip.build_model``
    (its SHA256 ``_download`` needs egress),
  * missing optional deps (timm/ftfy/torchvision) are shimmed with the few
    symbols the reference imports but does not exercise on these paths.

Trainable sets mirror the reference AS IT RUNS, including its quirks:
  * baseline: everything except the BNNeck biases frozen at construction
    (ref make_model.py:53-58, make_optimizer.py:3-28),
  * stage-1a: ctx_generic AND the whole text encoder — the reference never
    freezes the text encoder, so ``make_optimizer_1stage`` sweeps it in and
    it receives real gradients through the prompt forward
    (ref train_uniprompt.py:81-100, make_optimizer_prompt.py:38-58). Params
    with ``requires_grad=True`` but no gradient path (image encoder,
    classifiers, ...) are skipped by torch (``p.grad is None``) and are
    therefore excluded from our trainable tree — a zero-grad leaf would
    still move under coupled weight decay,
  * stage-2a: the inline freeze block resets ``requires_grad=True`` before
    freezing text/experts/prompt_learner (ref train_uniprompt.py:137-155) —
    so the BNNeck biases the constructor froze become trainable again;
    ``classifier_proj``/``bottleneck_proj``/``visual_prompt``/fusion net get
    no grad (stage-2 loss uses score head 0 + feat head 1 + i2t logits only,
    ref processor_uniprompt_stage2.py:106-119) and are excluded.

The production stage masks (solver/optim.py ``stage_trainable``) keep the
documented ctx-only / frozen-bias semantics; this harness passes explicit
trainable trees so both frameworks run the reference regime bit-for-bit.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

torch = pytest.importorskip("torch")
if not os.path.isdir(os.path.join(REFERENCE, "model", "clip")):
    pytest.skip("reference checkout not available", allow_module_level=True)

# ---------------------------------------------------------------------------
# dependency shims (install before any reference import)
# ---------------------------------------------------------------------------


def _install_shims():
    import torch.nn as nn

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")
        layers.DropPath = nn.Identity
        layers.to_2tuple = lambda x: x if isinstance(x, tuple) else (x, x)
        layers.trunc_normal_ = torch.nn.init.trunc_normal_
        timm.models = models
        models.layers = layers
        sys.modules.update(
            {"timm": timm, "timm.models": models, "timm.models.layers": layers}
        )
    if "ftfy" not in sys.modules:
        ftfy = types.ModuleType("ftfy")
        ftfy.fix_text = lambda s: s  # inputs here are already-clean ASCII
        sys.modules["ftfy"] = ftfy
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")

        class _Stub:  # imported by reference clip.py, unused on our paths
            def __init__(self, *a, **k):
                pass

        for name in ("Compose", "Resize", "CenterCrop", "ToTensor", "Normalize"):
            setattr(tr, name, type(name, (_Stub,), {}))

        class InterpolationMode:
            BICUBIC = 3

        tr.InterpolationMode = InterpolationMode
        tv.transforms = tr
        sys.modules.update({"torchvision": tv, "torchvision.transforms": tr})


_install_shims()
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)


@pytest.fixture(scope="module", autouse=True)
def _cuda_noop_patches():
    """Make the reference's hardcoded .cuda()/.to('cuda') calls no-ops."""
    import torch.nn as nn

    orig_to = nn.Module.to
    orig_mod_cuda = nn.Module.cuda
    orig_tensor_cuda = torch.Tensor.cuda

    def _is_cuda(arg):
        return arg == "cuda" or (
            isinstance(arg, torch.device) and arg.type == "cuda"
        )

    def fake_to(self, *args, **kwargs):
        if args and _is_cuda(args[0]):
            return self
        if _is_cuda(kwargs.get("device")):
            return self
        return orig_to(self, *args, **kwargs)

    # the reference margin heads allocate one-hots with a hardcoded
    # device='cuda' (ref loss/arcface.py:42, metric_learning.py:145,184)
    orig_zeros = torch.zeros

    def fake_zeros(*args, **kwargs):
        if _is_cuda(kwargs.get("device")):
            kwargs["device"] = "cpu"
        return orig_zeros(*args, **kwargs)

    nn.Module.to = fake_to
    nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.zeros = fake_zeros
    yield
    nn.Module.to = orig_to
    nn.Module.cuda = orig_mod_cuda
    torch.Tensor.cuda = orig_tensor_cuda
    torch.zeros = orig_zeros


# ---------------------------------------------------------------------------
# shared synthetic CLIP weights (ViT-B/16 dims, 2+2 layers)
# ---------------------------------------------------------------------------

EMBED_DIM = 512
VISION_WIDTH = 768
VISION_LAYERS = 2
TEXT_WIDTH = 512
TEXT_LAYERS = 2
VOCAB = 49408
GRID = 4
NUM_CLASSES = 8
H, W = 32, 16  # SIZE_TRAIN → 2×1 token grid at stride 16
MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


def make_clip_sd():
    """Seeded random CLIP state_dict at real ViT-B/16 widths (the reference
    model hardcodes in_planes=768/512 for 'ViT-B-16', ref make_model.py:37-42)
    but only 2 vision + 2 text layers so CPU runs stay fast."""
    g = torch.Generator().manual_seed(7)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.02

    sd = {
        "visual.conv1.weight": r(VISION_WIDTH, 3, 16, 16),
        "visual.class_embedding": r(VISION_WIDTH),
        "visual.positional_embedding": r(GRID * GRID + 1, VISION_WIDTH),
        "visual.ln_pre.weight": torch.ones(VISION_WIDTH),
        "visual.ln_pre.bias": r(VISION_WIDTH),
        "visual.ln_post.weight": torch.ones(VISION_WIDTH),
        "visual.ln_post.bias": r(VISION_WIDTH),
        "visual.proj": r(VISION_WIDTH, EMBED_DIM),
        "positional_embedding": r(77, TEXT_WIDTH),
        "token_embedding.weight": r(VOCAB, TEXT_WIDTH),
        "ln_final.weight": torch.ones(TEXT_WIDTH),
        "ln_final.bias": r(TEXT_WIDTH),
        "text_projection": r(TEXT_WIDTH, EMBED_DIM),
        "logit_scale": torch.tensor(2.6593),
    }

    def block(prefix, width):
        sd.update({
            f"{prefix}.attn.in_proj_weight": r(3 * width, width),
            f"{prefix}.attn.in_proj_bias": r(3 * width),
            f"{prefix}.attn.out_proj.weight": r(width, width),
            f"{prefix}.attn.out_proj.bias": r(width),
            f"{prefix}.ln_1.weight": torch.ones(width),
            f"{prefix}.ln_1.bias": r(width),
            f"{prefix}.mlp.c_fc.weight": r(4 * width, width),
            f"{prefix}.mlp.c_fc.bias": r(4 * width),
            f"{prefix}.mlp.c_proj.weight": r(width, 4 * width),
            f"{prefix}.mlp.c_proj.bias": r(width),
            f"{prefix}.ln_2.weight": torch.ones(width),
            f"{prefix}.ln_2.bias": r(width),
        })

    for i in range(VISION_LAYERS):
        block(f"visual.transformer.resblocks.{i}", VISION_WIDTH)
    for i in range(TEXT_LAYERS):
        block(f"transformer.resblocks.{i}", TEXT_WIDTH)
    return sd


@pytest.fixture(scope="module")
def clip_sd():
    return make_clip_sd()


def _patched_clip_loader(clip_sd):
    """Drop-in for the reference's load_clip_to_cpu (ref make_model.py:137-150)
    building from the synthetic state_dict through the reference's own
    clip.build_model, then fp32 (convert_weights makes it fp16)."""

    def load_clip_to_cpu(backbone_name, h_resolution, w_resolution, stride):
        from model.clip.model import build_model

        sd = {k: v.clone() for k, v in clip_sd.items()}
        return build_model(sd, h_resolution, w_resolution, stride).float()

    return load_clip_to_cpu


# ---------------------------------------------------------------------------
# configs (ONE tree drives both frameworks — reference code reads our CfgNode)
# ---------------------------------------------------------------------------


def parity_cfg():
    from mpreid_tpu.config import get_default_cfg

    cfg = get_default_cfg()
    cfg.MODEL.NAME = "ViT-B-16"
    cfg.MODEL.SIE_CAMERA = False
    cfg.MODEL.SIE_VIEW = False
    cfg.MODEL.IF_LABELSMOOTH = "on"
    cfg.MODEL.NO_MARGIN = False
    cfg.MODEL.METRIC_LOSS_TYPE = "triplet"
    cfg.MODEL.ID_LOSS_WEIGHT = 0.25
    cfg.MODEL.TRIPLET_LOSS_WEIGHT = 1.0
    cfg.MODEL.I2T_LOSS_WEIGHT = 1.0
    cfg.INPUT.SIZE_TRAIN = [H, W]
    cfg.INPUT.SIZE_TEST = [H, W]
    # disable augmentation randomness so both sides see identical pixels
    cfg.INPUT.PROB = 0.0
    cfg.INPUT.RE_PROB = 0.0
    cfg.INPUT.PADDING = 0
    cfg.INPUT.PIXEL_MEAN = list(MEAN)
    cfg.INPUT.PIXEL_STD = list(STD)
    cfg.DATALOADER.SAMPLER = "softmax_triplet"
    cfg.SOLVER.OPTIMIZER_NAME = "Adam"
    cfg.SOLVER.BASE_LR = 3.5e-4
    cfg.SOLVER.BIAS_LR_FACTOR = 2  # exercise per-group lr multipliers
    cfg.SOLVER.WEIGHT_DECAY = 5e-4
    cfg.SOLVER.WEIGHT_DECAY_BIAS = 1e-4
    cfg.SOLVER.LARGE_FC_LR = False
    cfg.SOLVER.MARGIN = 0.3
    cfg.SOLVER.STAGE1A.OPTIMIZER_NAME = "Adam"
    cfg.SOLVER.STAGE1A.BASE_LR = 1e-3
    # the reference's PROMPT-stage optimizer ignores BIAS_LR_FACTOR /
    # WEIGHT_DECAY_BIAS entirely (ref make_optimizer_prompt.py:38-58 — unlike
    # baseline make_optimizer.py:3-28); our framework honors them, so the
    # parity cfg pins them to the neutral values the reference effectively uses
    cfg.SOLVER.STAGE1A.BIAS_LR_FACTOR = 1
    cfg.SOLVER.STAGE1A.WEIGHT_DECAY = 1e-4
    cfg.SOLVER.STAGE1A.WEIGHT_DECAY_BIAS = 1e-4
    cfg.SOLVER.STAGE2.OPTIMIZER_NAME = "Adam"
    cfg.SOLVER.STAGE2.BASE_LR = 5e-4
    cfg.SOLVER.STAGE2.BIAS_LR_FACTOR = 2
    cfg.SOLVER.STAGE2.WEIGHT_DECAY = 1e-4
    cfg.SOLVER.STAGE2.WEIGHT_DECAY_BIAS = 1e-4
    cfg.SOLVER.STAGE2.LARGE_FC_LR = False
    cfg.TEST.NECK_FEAT = "after"
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


# ---------------------------------------------------------------------------
# data
# ---------------------------------------------------------------------------


def make_batches(n_steps, batch=8, seed=0):
    """(uint8 NHWC images, pids) per step — 4 pids × 2 instances (PK)."""
    rng = np.random.RandomState(seed)
    batches = []
    for s in range(n_steps):
        imgs = rng.randint(0, 256, size=(batch, H, W, 3)).astype(np.uint8)
        pids = rng.permutation(NUM_CLASSES)[: batch // 2]
        pids = np.repeat(pids, 2).astype(np.int32)
        batches.append((imgs, pids))
    return batches


def to_torch_input(imgs_u8):
    x = imgs_u8.astype(np.float32) / 255.0
    x = (x - np.asarray(MEAN, np.float32)) / np.asarray(STD, np.float32)
    return torch.from_numpy(x.transpose(0, 3, 1, 2))  # NHWC → NCHW


def jax_batch(imgs_u8, pids):
    import jax.numpy as jnp

    return {
        "images": jnp.asarray(imgs_u8),
        "pids": jnp.asarray(pids),
        "camids": jnp.zeros((len(pids),), jnp.int32),
        "trackids": jnp.zeros((len(pids),), jnp.int32),
    }


# ---------------------------------------------------------------------------
# model pair construction
# ---------------------------------------------------------------------------


def build_ref_baseline(cfg, clip_sd):
    import model.make_model as ref_mm

    ref_mm.load_clip_to_cpu = _patched_clip_loader(clip_sd)
    torch.manual_seed(3)
    return ref_mm.make_model(cfg, NUM_CLASSES, camera_num=2, view_num=1).float()


def build_ref_uniprompt(cfg, clip_sd):
    import model.make_model_uniprompt as ref_mmu

    ref_mmu.load_clip_to_cpu = _patched_clip_loader(clip_sd)
    torch.manual_seed(3)
    return ref_mmu.make_model(cfg, NUM_CLASSES, camera_num=2, view_num=1).float()


def build_ours_from_ref(cfg, clip_sd, ref_model, uniprompt):
    """Our model with weights copied from the (initialized) reference model."""
    import jax

    from mpreid_tpu.models.clip_model import convert_clip_state_dict
    from mpreid_tpu.models.convert import apply_overlay, convert_reid_state_dict
    from mpreid_tpu.models.factory import graft_clip_variables, init_variables
    from mpreid_tpu.models.reid import ReIDModel
    from mpreid_tpu.models.uniprompt import UniPromptReID

    clip_cfg, clip_vars = convert_clip_state_dict(
        {k: v.clone() for k, v in clip_sd.items()}, 2, 1, 16
    )
    cls = UniPromptReID if uniprompt else ReIDModel
    model = cls(
        clip_config=clip_cfg,
        num_classes=NUM_CLASSES,
        camera_num=2,
        view_num=1,
        sie_camera=cfg.MODEL.SIE_CAMERA,
        sie_view=cfg.MODEL.SIE_VIEW,
        sie_coe=cfg.MODEL.SIE_COE,
        neck_feat=cfg.TEST.NECK_FEAT,
    )
    variables = init_variables(model, jax.random.PRNGKey(0), cfg)
    variables = graft_clip_variables(variables, clip_vars)
    sd = {k: v.detach().clone() for k, v in ref_model.state_dict().items()}
    variables = apply_overlay(variables, convert_reid_state_dict(sd, model))
    return model, variables


def trainable_tree(params, pred):
    from mpreid_tpu.solver.optim import path_strings

    import jax

    return jax.tree_util.tree_map(pred, path_strings(params))


# ===========================================================================
# baseline train.py pipeline: N train steps + eval features + CMC/mAP
# ===========================================================================


@pytest.fixture(scope="module")
def baseline_run(clip_sd):
    """Train both frameworks 4 steps on identical batches; return per-step
    losses and post-training eval features on a shared val set."""
    import jax
    import jax.numpy as jnp

    from loss.make_loss import make_loss as ref_make_loss
    from solver.make_optimizer import make_optimizer as ref_make_optimizer

    from mpreid_tpu.engine.steps import make_eval_step, make_train_step
    from mpreid_tpu.engine.train_state import initial_state
    from mpreid_tpu.losses import make_loss
    from mpreid_tpu.solver import make_optimizer

    cfg = parity_cfg()
    batches = make_batches(4)

    # ---- reference side (torch), replicating the do_train hot loop
    # (ref processor/processor.py:57-88) with amp/scaler glue removed (CPU)
    ref_model = build_ref_baseline(cfg, clip_sd)
    loss_func, center_criterion = ref_make_loss(cfg, NUM_CLASSES)
    optimizer, _ = ref_make_optimizer(cfg, ref_model, center_criterion)
    ref_model.train()
    ref_losses = []
    for imgs, pids in batches:
        optimizer.zero_grad()
        target = torch.from_numpy(pids.astype(np.int64))
        score, feat = ref_model(to_torch_input(imgs), target)
        loss = loss_func(score, feat, target, None)
        loss.backward()
        optimizer.step()
        ref_losses.append(float(loss.detach()))

    # ---- our side (jax)
    ref_model_init = build_ref_baseline(cfg, clip_sd)  # fresh, same seeds
    model, variables = build_ours_from_ref(cfg, clip_sd, ref_model_init, False)
    loss_fn, _ = make_loss(cfg, NUM_CLASSES)
    opt = make_optimizer(cfg.SOLVER, variables["params"], stage="baseline")
    step = make_train_step(model, cfg, loss_fn, opt)
    state = initial_state(variables, opt)
    key = jax.random.PRNGKey(0)  # augmentation disabled → key irrelevant
    our_losses = []
    for imgs, pids in batches:
        state, metrics = step(state, jax_batch(imgs, pids), cfg.SOLVER.BASE_LR, key)
        our_losses.append(float(metrics["loss"]))

    # ---- post-training eval features on a shared val set
    rng = np.random.RandomState(42)
    val_imgs = rng.randint(0, 256, size=(24, H, W, 3)).astype(np.uint8)
    val_pids = rng.randint(0, NUM_CLASSES, size=24).astype(np.int32)
    val_camids = rng.randint(0, 4, size=24).astype(np.int32)

    ref_model.eval()
    with torch.no_grad():
        ref_feats = ref_model(to_torch_input(val_imgs)).numpy()

    eval_step = make_eval_step(model, cfg)
    our_feats = np.asarray(
        eval_step(state.params, state.batch_stats, jax_batch(val_imgs, val_pids))
    )
    return {
        "ref_losses": ref_losses,
        "our_losses": our_losses,
        "ref_feats": ref_feats,
        "our_feats": our_feats,
        "val_pids": val_pids,
        "val_camids": val_camids,
    }


def test_baseline_train_loss_parity(baseline_run):
    np.testing.assert_allclose(
        baseline_run["our_losses"], baseline_run["ref_losses"], rtol=2e-3, atol=2e-3
    )


def test_baseline_eval_feature_parity(baseline_run):
    # post-BN 1280-d concat features after 4 optimizer steps — checks the
    # whole train→BN-running-stats→eval chain, not just the forward pass
    np.testing.assert_allclose(
        baseline_run["our_feats"], baseline_run["ref_feats"], rtol=5e-3, atol=5e-3
    )


def test_cmc_map_parity(baseline_run):
    """Reference eval_func vs our cmc_map on the reference's own distmat
    (ref utils/metrics.py:28-88,110-132; remove=False protocol)."""
    import jax.numpy as jnp
    from utils.metrics import eval_func as ref_eval_func

    from mpreid_tpu.ops.distmat import euclidean_squared_distmat
    from mpreid_tpu.ops.metrics import cmc_map

    feats = torch.nn.functional.normalize(
        torch.from_numpy(baseline_run["ref_feats"]), dim=1, p=2
    ).numpy()
    num_query = 8
    qf, gf = feats[:num_query], feats[num_query:]
    q_pids = baseline_run["val_pids"][:num_query]
    g_pids = baseline_run["val_pids"][num_query:]
    q_camids = baseline_run["val_camids"][:num_query]
    g_camids = baseline_run["val_camids"][num_query:]

    distmat = np.asarray(
        euclidean_squared_distmat(jnp.asarray(qf), jnp.asarray(gf))
    )
    ref_cmc, ref_map = ref_eval_func(
        distmat, q_pids, g_pids, q_camids, g_camids, max_rank=10
    )
    our_cmc, our_map = cmc_map(
        jnp.asarray(distmat),
        jnp.asarray(q_pids),
        jnp.asarray(g_pids),
        jnp.asarray(q_camids),
        jnp.asarray(g_camids),
        max_rank=10,
        camera_filter=False,
    )
    np.testing.assert_allclose(np.asarray(our_cmc), ref_cmc, rtol=0, atol=1e-6)
    np.testing.assert_allclose(float(our_map), float(ref_map), rtol=0, atol=1e-6)


# ===========================================================================
# Uni-Prompt stage-1a: prompt-context training epoch
# ===========================================================================


@pytest.fixture(scope="module")
def uniprompt_pair(clip_sd):
    cfg = parity_cfg()
    ref_model = build_ref_uniprompt(cfg, clip_sd)
    model, variables = build_ours_from_ref(cfg, clip_sd, ref_model, True)
    return cfg, ref_model, model, variables


def test_stage1a_train_parity(uniprompt_pair, clip_sd):
    """One stage-1a mini-epoch (8 steps) over a shared image-feature bank
    (ref processor_uniprompt_stage1.py:66-98)."""
    import jax
    import jax.numpy as jnp
    from loss.supcontrast import SupConLoss
    from solver.make_optimizer_prompt import make_optimizer_1stage

    from mpreid_tpu.engine.steps import make_stage1_step
    from mpreid_tpu.engine.train_state import initial_state
    from mpreid_tpu.solver import make_optimizer

    cfg, ref_model, model, variables = uniprompt_pair
    # fresh weights per test: rebuild reference side (fixture model is shared)
    ref_model = build_ref_uniprompt(cfg, clip_sd)

    rng = np.random.RandomState(5)
    bank = rng.randn(32, EMBED_DIM).astype(np.float32)
    bank_labels = np.tile(np.arange(NUM_CLASSES), 4).astype(np.int64)
    order = rng.permutation(32)
    batch = 8
    steps = [(order[i * batch:(i + 1) * batch]) for i in range(4)]

    # ---- torch: construction already called enable_stage1a_training()
    ref_model.train()
    opt_ref = make_optimizer_1stage(cfg, ref_model, stage_name="STAGE1A")
    xent = SupConLoss("cpu")
    ref_losses = []
    for idx in steps:
        opt_ref.zero_grad()
        t = torch.from_numpy(bank_labels[idx])
        f = torch.from_numpy(bank[idx])
        tf = ref_model(label=t, get_text=True, view=None)
        loss = xent(f, tf, t, t) + xent(tf, f, t, t)
        loss.backward()
        opt_ref.step()
        ref_losses.append(float(loss.detach()))

    # ---- ours: trainable tree = ctx_generic + text encoder (see module
    # docstring: the reference's stage-1 optimizer sweeps the text encoder
    # in because nothing ever froze it). token_embedding stays frozen: in
    # the reference the prompt prefix/suffix are constant BUFFERS; here
    # they are recomputed from token_embedding, which must therefore not
    # receive the embedding-row gradients torch never applies.
    trainable = trainable_tree(
        variables["params"],
        lambda n: n.endswith("ctx_generic")
        or (n.startswith("text/") and "token_embedding" not in n),
    )
    opt = make_optimizer(cfg.SOLVER.STAGE1A, variables["params"], trainable=trainable)
    step = make_stage1_step(model, cfg, opt, "1a")
    # steps donate their input state; hand them a copy so the shared
    # module-scoped `variables` tree stays alive for the other tests
    state = initial_state(jax.tree_util.tree_map(jnp.array, variables), opt)
    our_losses = []
    for idx in steps:
        state, m = step(
            state,
            jnp.asarray(bank[idx]),
            jnp.asarray(bank_labels[idx].astype(np.int32)),
            jnp.zeros((batch,), jnp.int32),
            cfg.SOLVER.STAGE1A.BASE_LR,
        )
        our_losses.append(float(m["loss"]))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-3, atol=2e-3)


# ===========================================================================
# Uni-Prompt stage-2a: fine-tune with i2t logits
# ===========================================================================


def test_stage2a_train_parity(uniprompt_pair, clip_sd):
    """Text-feature precompute + 3 stage-2a steps
    (ref processor_uniprompt_stage2.py:58-135, train_uniprompt.py:137-166)."""
    import jax
    import jax.numpy as jnp
    from loss.make_loss import make_loss as ref_make_loss
    from solver.make_optimizer_prompt import make_optimizer_2astage

    from mpreid_tpu.engine.steps import make_text_step, make_train_step
    from mpreid_tpu.engine.train_state import initial_state
    from mpreid_tpu.losses import make_loss
    from mpreid_tpu.solver import make_optimizer

    cfg, _, model, variables = uniprompt_pair
    ref_model = build_ref_uniprompt(cfg, clip_sd)
    batches = make_batches(3, seed=11)

    # ---- torch side
    # after stage 1b the prompt learner is in stage '1b'; with view=None the
    # domain contexts fall back to their means (ref :364-367)
    ref_model.prompt_learner.set_training_stage("1b")
    for name, param in ref_model.named_parameters():
        param.requires_grad = True
        if "text_encoder" in name or "expert" in name or "prompt_learner" in name:
            param.requires_grad = False
    loss_func, center_criterion = ref_make_loss(cfg, NUM_CLASSES)
    opt_ref, _ = make_optimizer_2astage(cfg, ref_model, center_criterion)

    with torch.no_grad():
        labels_all = torch.arange(NUM_CLASSES)
        text_features_ref = ref_model(label=labels_all, get_text=True)

    ref_model.train()
    ref_losses = []
    for imgs, pids in batches:
        opt_ref.zero_grad()
        target = torch.from_numpy(pids.astype(np.int64))
        scores, feats_all, image_features_proj, _raw = ref_model(
            x=to_torch_input(imgs), label=target
        )
        logits_i2t = image_features_proj @ text_features_ref.t()
        loss = loss_func(scores[0], feats_all[1], target, None, logits_i2t)
        loss.backward()
        opt_ref.step()
        ref_losses.append(float(loss.detach()))

    # ---- ours
    text_step = make_text_step(model, "1b")
    text_features = text_step(
        variables["params"],
        variables.get("batch_stats", {}),
        jnp.arange(NUM_CLASSES, dtype=jnp.int32),
    )
    np.testing.assert_allclose(
        np.asarray(text_features),
        text_features_ref.detach().numpy(),
        rtol=2e-3,
        atol=2e-3,
    )

    # trainable tree mirrors the reference stage-2a run (see module
    # docstring): text/experts/prompt_learner frozen by name; BNNeck biases
    # UNfrozen by the requires_grad reset; proj head, visual_prompt and the
    # fusion net excluded because they get no gradient (torch skips
    # grad-None params, and under coupled wd a zero-grad leaf would drift)
    def pred(n):
        if n.startswith(("text/", "prompt_learner/")) or "expert" in n:
            return False
        if n.startswith(("classifier_proj/", "bottleneck_proj/")):
            return False
        if n.startswith(("fusion_fc1/", "fusion_fc2/")) or n == "visual_prompt":
            return False
        return True

    trainable = trainable_tree(variables["params"], pred)
    loss_fn, _ = make_loss(cfg, NUM_CLASSES)
    opt = make_optimizer(cfg.SOLVER.STAGE2, variables["params"], trainable=trainable)
    step = make_train_step(
        model, cfg, loss_fn, opt, uniprompt=True, text_features=text_features
    )
    # copy: steps donate, and `variables` is shared module-scoped state
    state = initial_state(jax.tree_util.tree_map(jnp.array, variables), opt)
    key = jax.random.PRNGKey(0)
    our_losses = []
    for imgs, pids in batches:
        state, m = step(
            state, jax_batch(imgs, pids), cfg.SOLVER.STAGE2.BASE_LR, key
        )
        our_losses.append(float(m["loss"]))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-3, atol=2e-3)


# ===========================================================================
# Uni-Prompt stage-1b: view-conditioned domain contexts
# ===========================================================================


def test_stage1b_train_parity(uniprompt_pair, clip_sd):
    """Stage-1b steps with real view labels exercising the MMMP camera-layout
    view→(platform, modality) map (ref make_model_uniprompt.py:334-377,
    train_uniprompt.py:102-122)."""
    import jax
    import jax.numpy as jnp
    from loss.supcontrast import SupConLoss
    from solver.make_optimizer_prompt import make_optimizer_1stage

    from mpreid_tpu.engine.steps import make_stage1_step
    from mpreid_tpu.engine.train_state import initial_state
    from mpreid_tpu.solver import make_optimizer

    cfg, _, model, variables = uniprompt_pair
    ref_model = build_ref_uniprompt(cfg, clip_sd)
    ref_model.enable_stage1b_training()

    rng = np.random.RandomState(8)
    bank = rng.randn(24, EMBED_DIM).astype(np.float32)
    bank_labels = np.tile(np.arange(NUM_CLASSES), 3).astype(np.int64)
    # cover all four platform/modality cells: cctv_rgb, cctv_ir, uav_rgb, uav_ir
    bank_views = rng.choice([0, 3, 7, 11, 12, 13], size=24).astype(np.int64)
    steps = [np.arange(i * 8, (i + 1) * 8) for i in range(3)]

    ref_model.train()
    opt_ref = make_optimizer_1stage(cfg, ref_model, stage_name="STAGE1A")
    xent = SupConLoss("cpu")
    ref_losses = []
    for idx in steps:
        opt_ref.zero_grad()
        t = torch.from_numpy(bank_labels[idx])
        f = torch.from_numpy(bank[idx])
        vw = torch.from_numpy(bank_views[idx])
        tf = ref_model(label=t, get_text=True, view=vw)
        loss = xent(f, tf, t, t) + xent(tf, f, t, t)
        loss.backward()
        opt_ref.step()
        ref_losses.append(float(loss.detach()))

    trainable = trainable_tree(
        variables["params"],
        lambda n: n.endswith(("ctx_modality", "ctx_platform"))
        or (n.startswith("text/") and "token_embedding" not in n),
    )
    opt = make_optimizer(cfg.SOLVER.STAGE1A, variables["params"], trainable=trainable)
    step = make_stage1_step(model, cfg, opt, "1b")
    state = initial_state(jax.tree_util.tree_map(jnp.array, variables), opt)
    our_losses = []
    for idx in steps:
        state, m = step(
            state,
            jnp.asarray(bank[idx]),
            jnp.asarray(bank_labels[idx].astype(np.int32)),
            jnp.asarray(bank_views[idx].astype(np.int32)),
            cfg.SOLVER.STAGE1A.BASE_LR,
        )
        our_losses.append(float(m["loss"]))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-3, atol=2e-3)


# ===========================================================================
# Uni-Prompt stage-2b: MoE gate+encoder training with load-balancing aux
# ===========================================================================


def test_stage2b_moe_train_parity(clip_sd):
    """Side-by-side stage-2b training steps on the MoE vision tower: the
    reference's 2b regime — gates + image encoder minus experts trainable,
    selected by the REAL ``make_optimizer_2bstage``
    (ref make_optimizer_prompt.py:111-152), with the task loss + 0.01 ×
    load-balancing aux computed by the reference's own
    ``load_balancing_loss_func`` (ref processor_uniprompt_stage2.py:75-128,
    clip/model.py:342-377).

    Tower-level because the reference cannot run stage-2b end-to-end: its
    ``make_model_uniprompt`` unpacks 3 outputs from image_encoder while the
    MoE visual returns 4, and ``switch_to_moe_model``
    (train_uniprompt.py:129) does not exist — SURVEY §2.2 #19/#33 bitrot.
    top_k = num_experts keeps routing continuous so float-tolerance parity
    is well defined; the discrete top-k dispatch equivalence is pinned in
    test_torch_parity.py::test_moe_visual_tower_parity."""
    import torch.nn as nn
    from model.clip.model import build_model, load_balancing_loss_func
    from solver.make_optimizer_prompt import make_optimizer_2bstage

    import jax
    import jax.numpy as jnp

    from mpreid_tpu.models.clip_model import CLIP, convert_clip_state_dict
    from mpreid_tpu.models.convert import _convert_vit_moe_trained
    from mpreid_tpu.models.moe import load_balancing_loss
    from mpreid_tpu.solver import make_optimizer

    E, n_moe = 2, 2
    g = torch.Generator().manual_seed(21)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.02

    sd = {k: v.clone() for k, v in clip_sd.items()}
    for i in range(n_moe):
        p = f"visual.transformer.resblocks.{i}"
        sd[f"{p}.gate.weight"] = r(E, VISION_WIDTH)
        for m in range(E):
            sd[f"{p}.experts.{m}.c_fc.weight"] = r(4 * VISION_WIDTH, VISION_WIDTH)
            sd[f"{p}.experts.{m}.c_fc.bias"] = r(4 * VISION_WIDTH)
            sd[f"{p}.experts.{m}.c_proj.weight"] = r(VISION_WIDTH, 4 * VISION_WIDTH)
            sd[f"{p}.experts.{m}.c_proj.bias"] = r(VISION_WIDTH)

    torch_clip = build_model(
        {k: v.clone() for k, v in sd.items()}, 2, 1, 16,
        num_experts=E, top_k=E, moe_layers=n_moe,
    ).float()

    class Wrapper(nn.Module):
        """Attribute named ``image_encoder`` so the reference 2b
        optimizer's name-based masks apply verbatim."""

        def __init__(self, visual):
            super().__init__()
            self.image_encoder = visual

    class _Center(nn.Module):  # make_optimizer_2bstage builds an SGD on it
        def __init__(self):
            super().__init__()
            self.c = nn.Parameter(torch.zeros(1))

    wrapper = Wrapper(torch_clip.visual)
    wrapper.train()
    cfg = parity_cfg()
    opt_ref, _ = make_optimizer_2bstage(cfg, wrapper, _Center())

    # ---- our tower with identical weights
    clip_cfg, variables = convert_clip_state_dict(
        {k: v.clone() for k, v in sd.items()
         if ".experts." not in k and ".gate." not in k},
        2, 1, 16, num_experts=E, top_k=E, moe_layers=n_moe,
    )
    vis_sd = {k: v for k, v in sd.items() if k.startswith("visual.")}
    vis_params, _ = _convert_vit_moe_trained(vis_sd, clip_cfg, n_moe)
    vis_params["positional_embedding"] = (
        variables["params"]["visual"]["positional_embedding"]
    )
    variables["params"]["visual"] = vis_params
    jax_model = CLIP(clip_cfg, dtype=np.float32)

    rng = np.random.RandomState(9)
    batches = [rng.randn(4, H, W, 3).astype(np.float32) * 0.5
               for _ in range(3)]
    tgt = (rng.randn(4, EMBED_DIM) * 0.1).astype(np.float32)
    tgt_t = torch.from_numpy(tgt)
    coeff = 0.01  # ref processor_uniprompt_stage2.py:76 (hardcoded there)

    ref_losses = []
    for x in batches:
        opt_ref.zero_grad()
        _, _, proj, logits = wrapper.image_encoder(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        )
        task = ((proj[:, 0] - tgt_t) ** 2).mean()
        # one gating block → one layer of router logits (the later MoE
        # block reuses its decision, ref model.py:306-330)
        aux = load_balancing_loss_func(logits, E)
        loss = task + coeff * aux
        loss.backward()
        opt_ref.step()
        ref_losses.append(float(loss.detach()))

    opt = make_optimizer(cfg.SOLVER.STAGE2, variables["params"],
                         stage="stage2b")
    train0, frozen = opt.partition(variables["params"])
    # the 2b mask must select exactly the reference's set: gates + every
    # image-encoder param outside the expert stacks, nothing from text
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(train0)[0]
    }
    assert any("gate" in n for n in flat)
    assert not any("experts" in n for n in flat)
    assert not any(n.startswith("text/") for n in flat)
    tgt_j = jnp.asarray(tgt)

    def loss_of(train_sub, x):
        params = opt.merge(train_sub, frozen)
        _, _, proj, logits = jax_model.apply(
            {"params": params}, x, method=lambda m, im: m.encode_image(im)
        )
        task = jnp.mean((proj[:, 0] - tgt_j) ** 2)
        aux = load_balancing_loss(logits.reshape(-1, E), E)
        return task + coeff * aux

    @jax.jit
    def step(train_sub, opt_state, x):
        loss, grads = jax.value_and_grad(loss_of)(train_sub, x)
        new_train, new_opt = opt.update(
            grads, opt_state, train_sub, cfg.SOLVER.STAGE2.BASE_LR
        )
        return new_train, new_opt, loss

    opt_state = opt.init(variables["params"])
    train_sub = train0
    our_losses = []
    for x in batches:
        train_sub, opt_state, loss = step(
            train_sub, opt_state, jnp.asarray(x)
        )
        our_losses.append(float(loss))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-3, atol=2e-3)


# ===========================================================================
# baseline with SIE camera embedding
# ===========================================================================


def test_baseline_sie_train_parity(clip_sd):
    """Two train steps with MODEL.SIE_CAMERA: the camera embedding is added
    to the class token and trained (ref make_model.py:68-79,88-96)."""
    import jax
    import jax.numpy as jnp
    from loss.make_loss import make_loss as ref_make_loss
    from solver.make_optimizer import make_optimizer as ref_make_optimizer

    from mpreid_tpu.engine.steps import make_train_step
    from mpreid_tpu.engine.train_state import initial_state
    from mpreid_tpu.losses import make_loss
    from mpreid_tpu.solver import make_optimizer

    cfg = parity_cfg()
    cfg.MODEL.SIE_CAMERA = True
    cfg.MODEL.SIE_COE = 1.5
    batches = make_batches(2, seed=21)
    camids = [np.array([0, 1] * 4, np.int64), np.array([1, 0] * 4, np.int64)]

    ref_model = build_ref_baseline(cfg, clip_sd)
    loss_func, center_criterion = ref_make_loss(cfg, NUM_CLASSES)
    optimizer, _ = ref_make_optimizer(cfg, ref_model, center_criterion)
    ref_model.train()
    ref_losses = []
    for (imgs, pids), cams in zip(batches, camids):
        optimizer.zero_grad()
        target = torch.from_numpy(pids.astype(np.int64))
        score, feat = ref_model(
            to_torch_input(imgs), target, cam_label=torch.from_numpy(cams)
        )
        loss = loss_func(score, feat, target, None)
        loss.backward()
        optimizer.step()
        ref_losses.append(float(loss.detach()))

    ref_init = build_ref_baseline(cfg, clip_sd)
    model, variables = build_ours_from_ref(cfg, clip_sd, ref_init, False)
    loss_fn, _ = make_loss(cfg, NUM_CLASSES)
    opt = make_optimizer(cfg.SOLVER, variables["params"], stage="baseline")
    step = make_train_step(model, cfg, loss_fn, opt)
    state = initial_state(variables, opt)
    key = jax.random.PRNGKey(0)
    our_losses = []
    for (imgs, pids), cams in zip(batches, camids):
        batch = jax_batch(imgs, pids)
        batch["camids"] = jnp.asarray(cams.astype(np.int32))
        state, m = step(state, batch, cfg.SOLVER.BASE_LR, key)
        our_losses.append(float(m["loss"]))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-3, atol=2e-3)


def test_baseline_sie_needs_cv_embed(clip_sd):
    """The converted reference model must carry cv_embed over."""
    cfg = parity_cfg()
    cfg.MODEL.SIE_CAMERA = True
    ref_model = build_ref_baseline(cfg, clip_sd)
    model, variables = build_ours_from_ref(cfg, clip_sd, ref_model, False)
    np.testing.assert_allclose(
        np.asarray(variables["params"]["cv_embed"]),
        ref_model.cv_embed.detach().numpy(),
    )


# ===========================================================================
# margin classifier heads vs the reference modules
# ===========================================================================


class TestMarginParity:
    """Our margin logits vs the reference's torch modules on shared weights
    (ref loss/arcface.py, loss/metric_learning.py — unreferenced by the
    reference's make_loss; wired here behind MODEL.COS_LAYER)."""

    F, C, B = 24, 10, 6

    def _data(self, seed=0):
        rng = np.random.RandomState(seed)
        feats = rng.randn(self.B, self.F).astype(np.float32)
        labels = rng.randint(0, self.C, self.B)
        return feats, labels

    def test_arcface(self):
        from loss.arcface import ArcFace

        from mpreid_tpu.losses.margin import arcface_logits

        feats, labels = self._data(0)
        ref = ArcFace(self.F, self.C, s=30.0, m=0.5)
        w = ref.weight.detach().numpy()
        with torch.no_grad():
            exp = ref(torch.from_numpy(feats), torch.from_numpy(labels)).numpy()
        import jax.numpy as jnp

        got = arcface_logits(
            jnp.asarray(feats), jnp.asarray(w), jnp.asarray(labels), s=30.0, m=0.5
        )
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-5, atol=1e-5)

    def test_cosface(self):
        from loss.metric_learning import Cosface

        from mpreid_tpu.losses.margin import cosface_logits

        feats, labels = self._data(1)
        ref = Cosface(self.F, self.C, s=30.0, m=0.3)
        w = ref.weight.detach().numpy()
        with torch.no_grad():
            exp = ref(torch.from_numpy(feats), torch.from_numpy(labels)).numpy()
        import jax.numpy as jnp

        got = cosface_logits(
            jnp.asarray(feats), jnp.asarray(w), jnp.asarray(labels), s=30.0, m=0.3
        )
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-5, atol=1e-5)

    def test_amsoftmax(self):
        from loss.metric_learning import AMSoftmax

        from mpreid_tpu.losses.margin import amsoftmax_logits

        feats, labels = self._data(2)
        ref = AMSoftmax(self.F, self.C, s=30.0, m=0.3)
        w = ref.W.detach().numpy()  # (feat, C)
        with torch.no_grad():
            exp = ref(torch.from_numpy(feats), torch.from_numpy(labels)).numpy()
        import jax.numpy as jnp

        got = amsoftmax_logits(
            jnp.asarray(feats), jnp.asarray(w), jnp.asarray(labels), s=30.0, m=0.3
        )
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-5, atol=1e-5)

    def test_circle(self):
        from loss.arcface import CircleLoss

        from mpreid_tpu.losses.margin import circle_logits

        feats, labels = self._data(3)
        ref = CircleLoss(self.F, self.C, s=64.0, m=0.25)
        w = ref.weight.detach().numpy()
        with torch.no_grad():
            exp = ref(
                torch.from_numpy(feats), torch.from_numpy(labels).long()
            ).numpy()
        import jax.numpy as jnp

        got = circle_logits(
            jnp.asarray(feats), jnp.asarray(w), jnp.asarray(labels), s=64.0, m=0.25
        )
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-4, atol=1e-4)


# ===========================================================================
# k-reciprocal re-ranking vs the reference implementation itself
# ===========================================================================


def test_reranking_parity_vs_reference():
    """Our XLA re-ranking and NumPy oracle vs the reference's
    utils/reranking.py (fp16 NumPy) on the same features: the reference's
    half-precision V/jaccard matrices shift distances at the 1e-3 level, so
    the assertion is on retrieval outcomes — identical CMC/mAP — plus a
    loose value check."""
    import jax.numpy as jnp
    from utils.reranking import re_ranking as ref_re_ranking

    from mpreid_tpu.ops.metrics import cmc_map
    from mpreid_tpu.ops.reranking import re_ranking
    from mpreid_tpu.ops.reranking_numpy import re_ranking_numpy

    rng = np.random.RandomState(0)
    n_ids, Q, G, D = 8, 20, 60, 32
    centers = rng.randn(n_ids, D).astype(np.float32)
    q_pids = rng.randint(0, n_ids, Q)
    g_pids = rng.randint(0, n_ids, G)
    qf = (centers[q_pids] + rng.randn(Q, D) * 0.4).astype(np.float32)
    gf = (centers[g_pids] + rng.randn(G, D) * 0.4).astype(np.float32)

    ref_d = ref_re_ranking(
        torch.from_numpy(qf), torch.from_numpy(gf), k1=10, k2=4,
        lambda_value=0.3,
    )
    our_d = np.asarray(re_ranking(jnp.asarray(qf), jnp.asarray(gf),
                                  k1=10, k2=4, lambda_value=0.3))
    oracle_d = re_ranking_numpy(qf, gf, k1=10, k2=4, lambda_value=0.3)

    np.testing.assert_allclose(our_d, ref_d, rtol=5e-2, atol=5e-3)
    np.testing.assert_allclose(oracle_d, ref_d, rtol=5e-2, atol=5e-3)

    cams_q = np.zeros(Q, np.int32)
    cams_g = np.ones(G, np.int32)

    def metrics(dist):
        cmc, mAP = cmc_map(
            jnp.asarray(dist), jnp.asarray(q_pids), jnp.asarray(g_pids),
            jnp.asarray(cams_q), jnp.asarray(cams_g), max_rank=10,
        )
        return np.asarray(cmc), float(mAP)

    cmc_ref, map_ref = metrics(ref_d)
    cmc_ours, map_ours = metrics(our_d)
    cmc_oracle, map_oracle = metrics(oracle_d)
    np.testing.assert_allclose(cmc_ours, cmc_ref, atol=1e-6)
    np.testing.assert_allclose(cmc_oracle, cmc_ref, atol=1e-6)
    assert abs(map_ours - map_ref) < 1e-3
    assert abs(map_oracle - map_ref) < 1e-3


# ===========================================================================
# LR schedules vs the reference scheduler classes
# ===========================================================================


class TestSchedulerParity:
    """Our pure epoch→lr functions vs the reference's torch schedulers
    driven the way its processors drive them."""

    def _dummy_optimizer(self, lr):
        p = torch.nn.Parameter(torch.zeros(1))
        return torch.optim.SGD([p], lr=lr)

    def test_warmup_multistep_vs_reference(self):
        from solver.lr_scheduler import WarmupMultiStepLR

        from mpreid_tpu.solver.schedules import warmup_multistep

        base = 3.5e-4
        opt = self._dummy_optimizer(base)
        ref = WarmupMultiStepLR(
            opt, milestones=[40, 70], gamma=0.1, warmup_factor=0.01,
            warmup_iters=10, warmup_method="linear",
        )
        ours = warmup_multistep(base, [40, 70], gamma=0.1, warmup_factor=0.01,
                                warmup_iters=10, warmup_method="linear")
        for epoch in range(0, 90):
            # _LRScheduler: after k step() calls last_epoch == k
            assert np.isclose(ref.get_lr()[0], ours(epoch), rtol=1e-9), epoch
            ref.step()

    def test_warmup_cosine_vs_reference_factory(self):
        from solver.scheduler_factory import create_scheduler

        from mpreid_tpu.solver.schedules import warmup_cosine

        base, epochs, lr_min, wu_init, wu_t = 3.5e-4, 60, 1e-6, 1e-5, 5
        opt = self._dummy_optimizer(base)
        ref = create_scheduler(opt, num_epochs=epochs, lr_min=lr_min,
                               warmup_lr_init=wu_init, warmup_t=wu_t)
        ours = warmup_cosine(base, epochs, lr_min=lr_min, warmup_t=wu_t,
                             warmup_lr_init=wu_init)
        for epoch in range(0, epochs + 10):
            # ref processors read scheduler._get_lr(epoch)
            # (processor_uniprompt_stage1.py:104, stage1 step(epoch) loop)
            assert np.isclose(ref._get_lr(epoch)[0], ours(epoch),
                              rtol=1e-9), epoch


# ===========================================================================
# export round-trip: train HERE → save_param → reference load_param → eval
# (closes the reverse-interop gap: the reference can independently validate
# a model trained in this framework, ref make_model.py:118-122)
# ===========================================================================


def _roundtrip_eval(ref_model, model, state, cfg):
    """Shared tail: export → reference load_param → compare eval + CMC/mAP."""
    import jax.numpy as jnp
    from utils.metrics import eval_func as ref_eval_func

    from mpreid_tpu.engine.steps import make_eval_step
    from mpreid_tpu.ops.distmat import euclidean_squared_distmat
    from mpreid_tpu.ops.metrics import cmc_map

    rng = np.random.RandomState(42)
    val_imgs = rng.randint(0, 256, size=(24, H, W, 3)).astype(np.uint8)
    val_pids = rng.randint(0, NUM_CLASSES, size=24).astype(np.int32)
    val_camids = rng.randint(0, 4, size=24).astype(np.int32)

    ref_model.eval()
    with torch.no_grad():
        ref_feats = ref_model(to_torch_input(val_imgs)).numpy()

    eval_step = make_eval_step(model, cfg)
    our_feats = np.asarray(
        eval_step(state.params, state.batch_stats, jax_batch(val_imgs, val_pids))
    )
    # features through BOTH frameworks from the exported weights
    np.testing.assert_allclose(our_feats, ref_feats, rtol=5e-3, atol=5e-3)

    # the reference's CMC/mAP on ITS OWN features from the exported model
    # must match ours on ours (the do_inference protocol, ref test.py:46-68)
    def metrics_of(feats, backend):
        f = feats / np.linalg.norm(feats, axis=1, keepdims=True)
        qf, gf = f[:8], f[8:]
        distmat = np.asarray(
            euclidean_squared_distmat(jnp.asarray(qf), jnp.asarray(gf))
        ) if backend == "ours" else (
            (qf[:, None, :] - gf[None, :, :]) ** 2
        ).sum(-1)
        if backend == "ours":
            cmc, mAP = cmc_map(
                jnp.asarray(distmat), jnp.asarray(val_pids[:8]),
                jnp.asarray(val_pids[8:]), jnp.asarray(val_camids[:8]),
                jnp.asarray(val_camids[8:]), max_rank=10, camera_filter=False,
            )
            return np.asarray(cmc), float(mAP)
        cmc, mAP = ref_eval_func(
            distmat.astype(np.float32), val_pids[:8], val_pids[8:],
            val_camids[:8], val_camids[8:], max_rank=10,
        )
        return np.asarray(cmc), float(mAP)

    our_cmc, our_map = metrics_of(our_feats, "ours")
    ref_cmc, ref_map = metrics_of(ref_feats, "ref")
    np.testing.assert_allclose(our_cmc, ref_cmc, rtol=0, atol=1e-6)
    assert abs(our_map - ref_map) < 1e-6


def test_export_roundtrip_baseline(clip_sd, tmp_path):
    """Train 3 baseline steps here, export with save_param, load through the
    reference's own load_param, and require identical eval CMC/mAP."""
    import jax

    from mpreid_tpu.engine.steps import make_train_step
    from mpreid_tpu.engine.train_state import initial_state
    from mpreid_tpu.losses import make_loss
    from mpreid_tpu.models.convert import save_param
    from mpreid_tpu.solver import make_optimizer

    cfg = parity_cfg()
    ref_init = build_ref_baseline(cfg, clip_sd)
    model, variables = build_ours_from_ref(cfg, clip_sd, ref_init, False)

    loss_fn, _ = make_loss(cfg, NUM_CLASSES)
    opt = make_optimizer(cfg.SOLVER, variables["params"], stage="baseline")
    step = make_train_step(model, cfg, loss_fn, opt)
    state = initial_state(
        jax.tree_util.tree_map(np.asarray, variables), opt
    )
    key = jax.random.PRNGKey(0)
    for imgs, pids in make_batches(3, seed=21):
        state, _ = step(state, jax_batch(imgs, pids), cfg.SOLVER.BASE_LR, key)

    pth = str(tmp_path / "ours_baseline.pth")
    save_param(
        pth, model,
        {"params": state.params, "batch_stats": state.batch_stats},
    )

    ref_model = build_ref_baseline(cfg, clip_sd)  # fresh weights
    ref_model.load_param(pth)  # the reference's own loader
    _roundtrip_eval(ref_model, model, state, cfg)


def test_export_roundtrip_uniprompt(uniprompt_pair, clip_sd, tmp_path):
    """Same round-trip through the uniprompt model (prompt contexts, visual
    prompt, fusion net, text encoder all ride the exported state_dict)."""
    import jax
    import jax.numpy as jnp

    from mpreid_tpu.engine.steps import make_text_step, make_train_step
    from mpreid_tpu.engine.train_state import initial_state
    from mpreid_tpu.losses import make_loss
    from mpreid_tpu.models.convert import save_param
    from mpreid_tpu.solver import make_optimizer

    cfg, _, model, variables = uniprompt_pair

    text_step = make_text_step(model, "1b")
    text_features = text_step(
        variables["params"], variables.get("batch_stats", {}),
        jnp.arange(NUM_CLASSES, dtype=jnp.int32),
    )
    loss_fn, _ = make_loss(cfg, NUM_CLASSES)
    opt = make_optimizer(cfg.SOLVER.STAGE2, variables["params"])
    step = make_train_step(
        model, cfg, loss_fn, opt, uniprompt=True, text_features=text_features
    )
    state = initial_state(jax.tree_util.tree_map(jnp.array, variables), opt)
    key = jax.random.PRNGKey(0)
    for imgs, pids in make_batches(2, seed=23):
        state, _ = step(
            state, jax_batch(imgs, pids), cfg.SOLVER.STAGE2.BASE_LR, key
        )

    pth = str(tmp_path / "ours_uniprompt.pth")
    save_param(
        pth, model,
        {"params": state.params, "batch_stats": state.batch_stats},
    )

    ref_model = build_ref_uniprompt(cfg, clip_sd)  # fresh weights
    ref_model.load_param(pth)
    _roundtrip_eval(ref_model, model, state, cfg)
