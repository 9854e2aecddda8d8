import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpreid_tpu.losses import (
    center_loss,
    cross_entropy,
    cross_entropy_label_smooth,
    euclidean_dist,
    hard_example_mining,
    supcon_loss,
    triplet_loss,
)


def rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape)


def np_euclidean(x, y):
    xx = (x**2).sum(1)[:, None]
    yy = (y**2).sum(1)[None, :]
    return np.sqrt(np.clip(xx + yy - 2 * x @ y.T, 1e-12, None))


def test_euclidean_dist_matches_numpy():
    x = np.asarray(rand(0, 8, 16))
    y = np.asarray(rand(1, 12, 16))
    got = np.asarray(euclidean_dist(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, np_euclidean(x, y), rtol=1e-4, atol=1e-5)


def test_hard_example_mining_bruteforce():
    labels = np.array([0, 0, 1, 1, 2, 2, 0, 1])
    d = np.abs(np.asarray(rand(2, 8, 8)))
    d = (d + d.T) / 2
    ap, an = hard_example_mining(jnp.asarray(d), jnp.asarray(labels))
    for i in range(8):
        pos = [d[i, j] for j in range(8) if labels[j] == labels[i]]
        neg = [d[i, j] for j in range(8) if labels[j] != labels[i]]
        assert np.isclose(float(ap[i]), max(pos), atol=1e-6)
        assert np.isclose(float(an[i]), min(neg), atol=1e-6)


def test_triplet_margin_analytic():
    # two identities, features engineered so ap and an are known
    feats = jnp.array([[0.0, 0], [3, 0], [10, 0], [10, 4]])
    labels = jnp.array([0, 0, 1, 1])
    loss, ap, an = triplet_loss(feats, labels, margin=0.3)
    # anchor 0: hardest pos dist 3, hardest neg dist 10
    assert np.isclose(float(ap[0]), 3.0, atol=1e-5)
    assert np.isclose(float(an[0]), 10.0, atol=1e-5)
    expected = np.mean(np.maximum(np.asarray(ap) - np.asarray(an) + 0.3, 0))
    assert np.isclose(float(loss), expected, atol=1e-6)


def test_triplet_soft_margin():
    feats = np.asarray(rand(3, 8, 4), dtype=np.float32)
    labels = jnp.array([0, 0, 1, 1, 2, 2, 3, 3])
    loss, ap, an = triplet_loss(jnp.asarray(feats), labels, margin=None)
    expected = np.mean(np.log1p(np.exp(np.asarray(ap) - np.asarray(an))))
    assert np.isclose(float(loss), expected, rtol=1e-5)


def test_label_smooth_ce_manual():
    logits = np.asarray(rand(4, 5, 7), dtype=np.float32)
    targets = np.array([0, 3, 6, 2, 1])
    got = float(cross_entropy_label_smooth(jnp.asarray(logits), jnp.asarray(targets), 7))
    logprobs = logits - np.log(np.exp(logits - logits.max(1, keepdims=True)).sum(1, keepdims=True)) - logits.max(1, keepdims=True)
    onehot = np.eye(7)[targets]
    smooth = 0.9 * onehot + 0.1 / 7
    expected = (-smooth * logprobs).mean(0).sum()
    assert np.isclose(got, expected, rtol=1e-5)


def test_plain_ce_matches_nll():
    logits = np.asarray(rand(5, 6, 4), dtype=np.float32)
    targets = np.array([0, 1, 2, 3, 0, 1])
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(targets)))
    p = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    expected = -np.log(p[np.arange(6), targets]).mean()
    assert np.isclose(got, expected, rtol=1e-5)


def test_center_loss_manual():
    centers = np.asarray(rand(6, 10, 8), dtype=np.float32)
    x = np.asarray(rand(7, 4, 8), dtype=np.float32)
    labels = np.array([0, 3, 9, 1])
    got = float(center_loss(jnp.asarray(centers), jnp.asarray(x), jnp.asarray(labels)))
    expected = np.mean(
        [np.clip(((x[i] - centers[labels[i]]) ** 2).sum(), 1e-12, 1e12) for i in range(4)]
    )
    assert np.isclose(got, expected, rtol=1e-4)


def test_supcon_loss_manual():
    t = np.asarray(rand(8, 4, 6), dtype=np.float32)
    i = np.asarray(rand(9, 6, 6), dtype=np.float32)
    tl = np.array([0, 1, 0, 2])
    il = np.array([0, 0, 1, 2, 2, 1])
    got = float(supcon_loss(jnp.asarray(t), jnp.asarray(i), jnp.asarray(tl), jnp.asarray(il)))
    logits = t @ i.T
    logits = logits - logits.max(1, keepdims=True)
    log_prob = logits - np.log(np.exp(logits).sum(1, keepdims=True))
    mask = (tl[:, None] == il[None, :]).astype(np.float32)
    expected = -np.mean((mask * log_prob).sum(1) / mask.sum(1))
    assert np.isclose(got, expected, rtol=1e-5)


def test_make_loss_closure():
    from mpreid_tpu.config import get_default_cfg
    from mpreid_tpu.losses import make_loss

    cfg = get_default_cfg()
    cfg.DATALOADER.SAMPLER = "softmax_triplet"
    cfg.MODEL.ID_LOSS_WEIGHT = 0.25
    cfg.MODEL.TRIPLET_LOSS_WEIGHT = 1.0
    cfg.MODEL.I2T_LOSS_WEIGHT = 1.0
    loss_fn, (center_init, center_fn) = make_loss(cfg, num_classes=4)

    score = [np.asarray(rand(11, 8, 4)), np.asarray(rand(12, 8, 4))]
    feat = [np.asarray(rand(13, 8, 16))]
    target = jnp.array([0, 0, 1, 1, 2, 2, 3, 3])
    i2t = np.asarray(rand(14, 8, 4))
    loss = loss_fn([jnp.asarray(s) for s in score], [jnp.asarray(f) for f in feat], target, None, jnp.asarray(i2t))

    id_part = sum(
        float(cross_entropy_label_smooth(jnp.asarray(s), target, 4)) for s in score
    )
    tri_part = float(triplet_loss(jnp.asarray(feat[0]), target, margin=0.3)[0])
    i2t_part = float(cross_entropy_label_smooth(jnp.asarray(i2t), target, 4))
    assert np.isclose(float(loss), 0.25 * id_part + tri_part + i2t_part, rtol=1e-5)

    centers = center_init(jax.random.PRNGKey(0))
    assert centers.shape == (4, 2048)
    assert float(center_fn(centers, jnp.asarray(rand(15, 8, 2048)), target)) > 0


def test_margin_heads():
    from mpreid_tpu.losses import arcface_logits, cosface_logits, amsoftmax_logits, circle_logits

    feats = rand(20, 6, 16)
    w = rand(21, 9, 16)  # (C, feat)
    labels = jnp.array([0, 1, 2, 3, 4, 5])
    cos = np.asarray(
        jnp.dot(
            feats / jnp.linalg.norm(feats, axis=1, keepdims=True),
            (w / jnp.linalg.norm(w, axis=1, keepdims=True)).T,
        )
    )
    arc = np.asarray(arcface_logits(feats, w, labels, s=30.0, m=0.5))
    cosf = np.asarray(cosface_logits(feats, w, labels, s=30.0, m=0.3))
    for i, l in enumerate(labels.tolist()):
        # target logit is penalized relative to the raw cosine
        assert arc[i, l] < 30.0 * cos[i, l] + 1e-5
        assert np.isclose(cosf[i, l], 30.0 * (cos[i, l] - 0.3), atol=1e-4)
        # non-target logits unchanged
        j = (l + 1) % 9
        assert np.isclose(arc[i, j], 30.0 * cos[i, j], atol=1e-4)
    am = np.asarray(amsoftmax_logits(feats, w.T, labels, s=30.0, m=0.3))
    np.testing.assert_allclose(am, cosf, rtol=1e-4, atol=1e-4)
    c = circle_logits(feats, w, labels)
    assert c.shape == (6, 9)
