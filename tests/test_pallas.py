"""Pallas kernels vs XLA/NumPy oracles (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpreid_tpu.losses import triplet_loss
from mpreid_tpu.ops.pallas_kernels import (
    _batch_hard_forward,
    batch_hard_triplet_loss,
    fused_batch_hard,
    l1_cross_pallas,
)


def pk_batch(seed=0, n_ids=4, k=4, dim=32):
    rng = np.random.RandomState(seed)
    labels = np.repeat(np.arange(n_ids), k)
    feats = rng.randn(n_ids * k, dim).astype(np.float32)
    return jnp.asarray(feats), jnp.asarray(labels)


class TestFusedBatchHard:
    def test_forward_matches_xla(self):
        feats, labels = pk_batch()
        ap_p, an_p, p_p, n_p = _batch_hard_forward(feats, labels, interpret=True)
        from mpreid_tpu.losses import euclidean_dist, hard_example_mining

        d = euclidean_dist(feats, feats)
        ap, an = hard_example_mining(d, labels)
        np.testing.assert_allclose(np.asarray(ap_p), np.asarray(ap), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(an_p), np.asarray(an), rtol=1e-5)

    def test_forward_nondivisible_batch(self):
        # batch 12 (not a multiple of 8) exercises padding
        feats, labels = pk_batch(n_ids=3, k=4, dim=20)
        ap_p, an_p, _, _ = _batch_hard_forward(feats, labels, interpret=True)
        from mpreid_tpu.losses import euclidean_dist, hard_example_mining

        ap, an = hard_example_mining(euclidean_dist(feats, feats), labels)
        np.testing.assert_allclose(np.asarray(ap_p), np.asarray(ap), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(an_p), np.asarray(an), rtol=1e-5)

    def test_custom_vjp_matches_autodiff(self):
        feats, labels = pk_batch(seed=3)

        def loss_fused(f):
            return batch_hard_triplet_loss(f, labels, margin=0.3, use_pallas=False)[0]

        def loss_ref(f):
            return triplet_loss(f, labels, margin=0.3)[0]

        g_fused = jax.grad(loss_fused)(feats)
        g_ref = jax.grad(loss_ref)(feats)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-5)

    def test_soft_margin_grad(self):
        feats, labels = pk_batch(seed=5)
        g1 = jax.grad(lambda f: batch_hard_triplet_loss(f, labels, None, False)[0])(feats)
        g2 = jax.grad(lambda f: triplet_loss(f, labels, margin=None)[0])(feats)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


class TestL1Cross:
    @pytest.mark.parametrize("q,g,n", [(16, 24, 40), (130, 70, 600)])
    def test_matches_numpy(self, q, g, n):
        rng = np.random.RandomState(0)
        a = np.abs(rng.randn(q, n)).astype(np.float32)
        b = np.abs(rng.randn(g, n)).astype(np.float32)
        got = np.asarray(
            l1_cross_pallas(jnp.asarray(a), jnp.asarray(b),
                            tile_q=64, tile_g=64, chunk_k=128, interpret=True)
        )
        exp = np.abs(a[:, None, :] - b[None, :, :]).sum(-1)
        np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-3)


class TestFusedAttention:
    """Pallas fused MHA vs the XLA einsum path (the pre-kernel math)."""

    def _qkv(self, b, l, d, seed=0, dtype=np.float32):
        rng = np.random.RandomState(seed)
        return jnp.asarray(rng.randn(b, l, 3 * d).astype(np.float32) * 0.3,
                           dtype=dtype)

    @pytest.mark.parametrize("b,l,d,h", [(2, 129, 128, 2), (3, 77, 64, 1)])
    def test_forward_matches_reference(self, b, l, d, h):
        from mpreid_tpu.ops.attention import fused_attention, mha_reference

        qkv = self._qkv(b, l, d)
        got = fused_attention(qkv, h, force="interpret")
        exp = mha_reference(qkv, h)
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                   rtol=1e-5, atol=1e-5)

    def test_forward_with_causal_mask(self):
        from mpreid_tpu.ops.attention import fused_attention, mha_reference

        l, d, h = 77, 64, 2
        qkv = self._qkv(2, l, d, seed=1)
        mask = jnp.triu(jnp.full((l, l), -1e9, jnp.float32), k=1)
        got = fused_attention(qkv, h, mask, force="interpret")
        exp = mha_reference(qkv, h, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("use_mask", [False, True])
    def test_backward_matches_autodiff_of_reference(self, use_mask):
        from mpreid_tpu.ops.attention import fused_attention, mha_reference

        b, l, d, h = 2, 33, 64, 2
        qkv = self._qkv(b, l, d, seed=2)
        mask = (jnp.triu(jnp.full((l, l), -1e9, jnp.float32), k=1)
                if use_mask else None)
        cot = jnp.asarray(
            np.random.RandomState(3).randn(b, l, d).astype(np.float32)
        )

        g_fused = jax.grad(
            lambda x: jnp.sum(fused_attention(x, h, mask, force="interpret") * cot)
        )(qkv)
        g_ref = jax.grad(
            lambda x: jnp.sum(mha_reference(x, h, mask) * cot)
        )(qkv)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-5)

    def test_bf16_forward_close(self):
        from mpreid_tpu.ops.attention import fused_attention, mha_reference

        qkv = self._qkv(2, 33, 128, seed=4, dtype=jnp.bfloat16)
        got = fused_attention(qkv, 2, force="interpret").astype(jnp.float32)
        exp = mha_reference(qkv, 2).astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                   rtol=2e-2, atol=2e-2)


class TestFusedAttentionHeadMajor:
    """Head-major layout kernels (ops/attention.py, (batch × head-group)
    grid) must match both their einsum oracle and the packed-layout path
    after the static column permutation."""

    def _qkv(self, b=5, l=13, d=48, seed=0):
        rng = np.random.RandomState(seed)
        return jnp.asarray(rng.randn(b, l, 3 * d).astype(np.float32))

    def test_permuted_equals_packed(self):
        from mpreid_tpu.ops.attention import (
            head_major_perm, mha_reference, mha_reference_hm,
        )

        qkv = self._qkv()
        ref = mha_reference(qkv, 4)
        hm = mha_reference_hm(qkv[:, :, head_major_perm(48, 4)], 4)
        np.testing.assert_allclose(np.asarray(hm), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("use_mask", [False, True])
    def test_kernel_matches_oracle(self, use_mask):
        from mpreid_tpu.ops.attention import (
            fused_attention_hm, head_major_perm, mha_reference_hm,
        )

        qkv = self._qkv()[:, :, head_major_perm(48, 4)]
        mask = (
            jnp.asarray(np.triu(np.full((13, 13), -1e9, np.float32), 1))
            if use_mask else None
        )
        got = fused_attention_hm(qkv, 4, mask, force="interpret")
        want = mha_reference_hm(qkv, 4, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("use_mask", [False, True])
    def test_backward_matches_autodiff_of_oracle(self, use_mask):
        from mpreid_tpu.ops.attention import (
            fused_attention_hm, head_major_perm, mha_reference_hm,
        )

        qkv = self._qkv()[:, :, head_major_perm(48, 4)]
        mask = (
            jnp.asarray(np.triu(np.full((13, 13), -1e9, np.float32), 1))
            if use_mask else None
        )
        cot = jnp.asarray(np.random.RandomState(1).randn(5, 13, 48), jnp.float32)
        g_ker = jax.grad(
            lambda x: jnp.sum(
                fused_attention_hm(x, 4, mask, force="interpret") * cot
            )
        )(qkv)
        g_ref = jax.grad(
            lambda x: jnp.sum(mha_reference_hm(x, 4, mask) * cot)
        )(qkv)
        np.testing.assert_allclose(np.asarray(g_ker), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-5)

    def test_model_layer_layouts_agree(self):
        """MultiHeadAttention output must be bitwise-layout-independent:
        the hm path permutes weights, not math."""
        from mpreid_tpu.models.layers import MultiHeadAttention
        from mpreid_tpu.ops import attention as attn

        x = jnp.asarray(np.random.RandomState(2).randn(3, 7, 32), jnp.float32)
        layer = MultiHeadAttention(dim=32, num_heads=4)
        variables = layer.init(jax.random.PRNGKey(0), x)
        old = attn.MODEL_LAYOUT
        try:
            attn.MODEL_LAYOUT = "hm"
            out_hm = layer.apply(variables, x)
            attn.MODEL_LAYOUT = "packed"
            out_packed = layer.apply(variables, x)
        finally:
            attn.MODEL_LAYOUT = old
        np.testing.assert_allclose(np.asarray(out_hm), np.asarray(out_packed),
                                   rtol=1e-6, atol=1e-6)
