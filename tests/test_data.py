import numpy as np
import pytest

from mpreid_tpu.data import (
    MMMP,
    Market1501,
    RandomIdentitySampler,
    RegDB,
    SYSU,
    build_dataset,
    make_dataloader,
    shard_for_host,
)
from mpreid_tpu.data.synthetic import (
    make_market1501,
    make_mmmp,
    make_msmt17,
    make_regdb,
    make_sysu,
)


@pytest.fixture(scope="module")
def market_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("market")
    make_market1501(str(root))
    return str(root)


@pytest.fixture(scope="module")
def mmmp_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mmmp")
    make_mmmp(str(root))
    return str(root)


class TestMarket1501:
    def test_splits_and_relabel(self, market_root):
        ds = Market1501(root=market_root)
        assert ds.num_train_pids == 6
        # train pids relabeled to 0..5
        assert sorted({r.pid for r in ds.train}) == list(range(6))
        # query/gallery keep original pids
        assert min(r.pid for r in ds.query) == 7
        assert all(0 <= r.camid <= 5 for r in ds.train)

    def test_registry(self, market_root):
        ds = build_dataset("market1501", market_root)
        assert len(ds.train) == 24

    def test_missing_root_raises(self):
        with pytest.raises(RuntimeError):
            Market1501(root="/nonexistent")


class TestMMMP:
    def test_cross_setting(self, mmmp_root):
        ds = MMMP(root=mmmp_root, exp_setting="exp_cctv_ir_cctv_rgb")
        # train = 5 ids (4 train + 1 val) relabeled
        assert ds.num_train_pids == 5
        assert sorted({r.pid for r in ds.train}) == list(range(5))
        # query cameras: cctv_ir = cams 07-12 (0-based 6..11)
        assert {r.camid for r in ds.query} == set(range(6, 12))
        # gallery cameras: cctv_rgb = cams 01-06 (0-based 0..5)
        assert {r.camid for r in ds.gallery} == set(range(0, 6))
        # trackid carries the camera id (view label for stage-1b)
        assert all(r.trackid == r.camid for r in ds.train)

    def test_same_modality_setting(self, mmmp_root):
        ds = MMMP(root=mmmp_root, exp_setting="exp_rgb", split_seed=0)
        # rgb group: cctv 01-06 + uav 13
        assert {r.camid for r in ds.query} | {r.camid for r in ds.gallery} <= {
            0, 1, 2, 3, 4, 5, 12
        }
        # per (pid, cam) split: query and gallery are disjoint
        q = {r.img_path for r in ds.query}
        g = {r.img_path for r in ds.gallery}
        assert not (q & g)

    def test_same_split_deterministic(self, mmmp_root):
        a = MMMP(root=mmmp_root, exp_setting="exp_rgb", split_seed=7)
        b = MMMP(root=mmmp_root, exp_setting="exp_rgb", split_seed=7)
        assert [r.img_path for r in a.query] == [r.img_path for r in b.query]


class TestSYSU:
    def test_rgb2ir(self, tmp_path):
        root = make_sysu(str(tmp_path))
        ds = SYSU(root=root, exp_setting="all_train_rgb2ir")
        assert ds.num_train_pids == 5
        # query = RGB cams (ids 1,2,4,5 per cam_name map → 1,2,3,4)
        assert {r.camid for r in ds.query} == {1, 2, 3, 4}
        assert {r.camid for r in ds.gallery} == {5, 6}

    def test_bad_setting(self, tmp_path):
        root = make_sysu(str(tmp_path / "x"))
        with pytest.raises(ValueError):
            SYSU(root=root, exp_setting="nope")


class TestRegDB:
    def test_trial_files(self, tmp_path):
        root = make_regdb(str(tmp_path))
        ds = RegDB(root=root, exp_setting="rgb2ir_1")
        assert {r.camid for r in ds.query} == {0}
        assert {r.camid for r in ds.gallery} == {1}
        # train merges both modalities with relabeled ids
        assert {r.camid for r in ds.train} == {0, 1}
        assert sorted({r.pid for r in ds.train}) == list(range(4))

    def test_reverse_direction(self, tmp_path):
        root = make_regdb(str(tmp_path / "r"))
        ds = RegDB(root=root, exp_setting="ir2rgb_1")
        assert {r.camid for r in ds.query} == {1}


def test_msmt17(tmp_path):
    make_msmt17(str(tmp_path))
    ds = build_dataset("msmt17", str(tmp_path))
    assert ds.num_train_pids == 4
    assert len(ds.query) > 0 and len(ds.gallery) > 0


class TestPKSampler:
    def make_records(self, counts):
        recs = []
        for pid, n in counts.items():
            for i in range(n):
                recs.append((f"{pid}_{i}.jpg", pid, 0, 0))
        return recs

    def test_batch_composition(self):
        recs = self.make_records({0: 8, 1: 8, 2: 8, 3: 8})
        s = RandomIdentitySampler(recs, batch_size=8, num_instances=4, seed=0)
        idxs = s.epoch_indices(0)
        assert len(idxs) % 8 == 0
        pids = np.array([recs[i][1] for i in idxs])
        for b in pids.reshape(-1, 8):
            # each batch: 2 pids × 4 instances
            vals, counts = np.unique(b, return_counts=True)
            assert len(vals) == 2 and (counts == 4).all()

    def test_oversample_small_identity(self):
        recs = self.make_records({0: 2, 1: 8})
        s = RandomIdentitySampler(recs, batch_size=8, num_instances=4, seed=0)
        idxs = s.epoch_indices(0)
        pids = np.array([recs[i][1] for i in idxs])
        # pid 0 has 2 images but must appear in groups of 4 (with replacement)
        assert (pids == 0).sum() in (0, 4)

    def test_length_estimate(self):
        recs = self.make_records({0: 10, 1: 3, 2: 4})
        s = RandomIdentitySampler(recs, batch_size=8, num_instances=4, seed=0)
        # 10→8, 3→4 (oversampled), 4→4
        assert len(s) == 16

    def test_deterministic_per_epoch(self):
        recs = self.make_records({i: 6 for i in range(6)})
        s = RandomIdentitySampler(recs, batch_size=8, num_instances=2, seed=3)
        a = s.epoch_indices(1)
        b = s.epoch_indices(1)
        c = s.epoch_indices(2)
        assert (a == b).all()
        assert not np.array_equal(a, c)

    def test_host_sharding_covers_batch(self):
        recs = self.make_records({i: 8 for i in range(8)})
        s = RandomIdentitySampler(recs, batch_size=16, num_instances=4, seed=0)
        idxs = s.epoch_indices(0)
        shards = [shard_for_host(idxs, 16, 4, h) for h in range(4)]
        # per global batch, the union of host shards equals the global batch
        n_batches = len(idxs) // 16
        for b in range(n_batches):
            union = np.concatenate([sh[b * 4 : (b + 1) * 4] for sh in shards])
            assert sorted(union) == sorted(idxs[b * 16 : (b + 1) * 16])


def test_make_dataloader_contract(market_root):
    from mpreid_tpu.config import get_default_cfg

    cfg = get_default_cfg()
    cfg.DATASETS.NAMES = "market1501"
    cfg.DATASETS.ROOT_DIR = market_root
    cfg.DATALOADER.SAMPLER = "softmax_triplet"
    cfg.DATALOADER.NUM_INSTANCE = 4
    cfg.DATALOADER.NUM_WORKERS = 2
    cfg.SOLVER.STAGE2.IMS_PER_BATCH = 8
    cfg.SOLVER.STAGE1.IMS_PER_BATCH = 8
    cfg.TEST.IMS_PER_BATCH = 16
    cfg.INPUT.SIZE_TRAIN = [32, 16]
    cfg.INPUT.SIZE_TEST = [32, 16]

    (tl2, tl1, val, num_query, num_classes, cam_num, view_num) = make_dataloader(cfg)
    assert num_classes == 6 and num_query == 24
    batch = next(tl2.epoch(0))
    assert batch["images"].shape == (8, 32, 16, 3)
    assert batch["images"].dtype == np.uint8
    # PK structure: 2 pids × 4 instances
    vals, counts = np.unique(batch["pids"], return_counts=True)
    assert (counts == 4).all()

    vbatches = list(val.iter_sequential())
    assert sum(b["count"] for b in vbatches) == 48
    assert all(b["images"].shape[0] == 16 for b in vbatches)


def test_augment_pipeline():
    import jax
    import jax.numpy as jnp
    from mpreid_tpu.ops.augment import train_augment, eval_preprocess

    imgs = np.random.RandomState(0).randint(0, 255, (4, 32, 16, 3), dtype=np.uint8)
    out = train_augment(jnp.asarray(imgs), jax.random.PRNGKey(0),
                        mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))
    assert out.shape == (4, 32, 16, 3) and out.dtype == jnp.float32
    # deterministic given the key
    out2 = train_augment(jnp.asarray(imgs), jax.random.PRNGKey(0),
                         mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # different key → different augmentation
    out3 = train_augment(jnp.asarray(imgs), jax.random.PRNGKey(1),
                         mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))
    assert not np.array_equal(np.asarray(out), np.asarray(out3))

    ev = eval_preprocess(jnp.asarray(imgs), mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))
    np.testing.assert_allclose(
        np.asarray(ev), (imgs.astype(np.float32) / 255.0 - 0.5) / 0.5, atol=1e-6
    )


def test_identity_signal_fixture_is_learnable(tmp_path):
    """identity_signal images of the same id must be closer in pixel space."""
    from mpreid_tpu.data.synthetic import make_market1501
    from mpreid_tpu.data import Market1501, ImageBatcher

    make_market1501(str(tmp_path), n_ids=4, imgs_per_id=4, identity_signal=True)
    ds = Market1501(root=str(tmp_path))
    batcher = ImageBatcher(ds.train, (32, 16), batch_size=16, num_workers=2)
    batch = next(batcher.iter_sequential())
    imgs = batch["images"].astype(np.float32).reshape(16, -1)
    pids = batch["pids"]
    d = ((imgs[:, None, :] - imgs[None, :, :]) ** 2).sum(-1) ** 0.5
    same = pids[:, None] == pids[None, :]
    off_diag = ~np.eye(16, dtype=bool)
    intra = d[same & off_diag].mean()
    inter = d[~same].mean()
    assert intra < inter * 0.8, (intra, inter)


def test_pad_crop_batch_matches_per_image_dynamic_slice():
    """The gather-based batched crop is bit-identical to the original
    per-image pad + dynamic_slice formulation (same key usage)."""
    import jax
    import jax.numpy as jnp
    from mpreid_tpu.ops.augment import _pad_crop_batch

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(5, 12, 7, 3).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(3), 5)
    padding = 4

    got = _pad_crop_batch(imgs, keys, padding)

    def per_image(img, key):
        h, w, c = img.shape
        padded = jnp.pad(img, ((padding, padding), (padding, padding), (0, 0)))
        ky, kx = jax.random.split(key)
        oy = jax.random.randint(ky, (), 0, 2 * padding + 1)
        ox = jax.random.randint(kx, (), 0, 2 * padding + 1)
        return jax.lax.dynamic_slice(padded, (oy, ox, 0), (h, w, c))

    exp = jax.vmap(per_image)(imgs, keys)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(exp))
