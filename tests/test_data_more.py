"""Loader tests for the remaining dataset families."""

import numpy as np
import pytest

from mpreid_tpu.data import (
    AGReIDv2,
    DukeMTMCreID,
    G2APS,
    OccDukeMTMCreID,
    VeRi,
    VehicleID,
    build_dataset,
)
from mpreid_tpu.data.synthetic import (
    make_agreid,
    make_duke,
    make_g2aps,
    make_vehicleid,
    make_veri,
)


def test_dukemtmc(tmp_path):
    make_duke(str(tmp_path))
    ds = DukeMTMCreID(root=str(tmp_path))
    assert ds.num_train_pids == 4
    assert sorted({r.pid for r in ds.train}) == list(range(4))
    assert all(0 <= r.camid <= 7 for r in ds.train)
    assert all(r.trackid == 0 for r in ds.train)


def test_occ_duke(tmp_path):
    make_duke(str(tmp_path), occluded=True)
    ds = OccDukeMTMCreID(root=str(tmp_path))
    assert ds.num_train_pids == 4
    # the reference marks occluded-duke records with trackid 1
    assert all(r.trackid == 1 for r in ds.train)


def test_g2aps(tmp_path):
    make_g2aps(str(tmp_path))
    ds = G2APS(root=str(tmp_path))
    assert ds.num_train_pids == 4
    assert len(ds.query) == len(ds.gallery) == 12


def test_veri_views(tmp_path):
    make_veri(str(tmp_path))
    ds = VeRi(root=str(tmp_path))
    assert ds.num_train_pids == 4
    # viewpoint labels propagated from keypoint files into trackid slot
    views = {r.trackid for r in ds.train}
    assert len(views) > 1
    assert all(1 <= r.camid + 1 <= 20 for r in ds.train)


def test_veri_skips_unannotated(tmp_path):
    base = make_veri(str(tmp_path))
    # remove one name from the keypoint test file → that sample is dropped
    import os.path as osp

    kp = osp.join(base, "keypoints", "keypoint_test.txt")
    lines = open(kp).read().strip().splitlines()
    open(kp, "w").write("\n".join(lines[1:]) + "\n")
    ds = VeRi(root=str(tmp_path))
    assert len(ds.query) + len(ds.gallery) == len(lines) - 1


def test_agreidv2(tmp_path):
    make_agreid(str(tmp_path), exp_setting="exp1")
    ds = AGReIDv2(root=str(tmp_path), exp_setting="exp1")
    assert ds.num_train_pids == 4
    assert len(ds.query) == len(ds.gallery) == 8
    assert ds.num_train_vids == 1


def test_agreid_requires_split_file(tmp_path):
    make_agreid(str(tmp_path / "a"), exp_setting="exp1")
    with pytest.raises(RuntimeError):
        AGReIDv2(root=str(tmp_path / "a"), exp_setting="missing")


class TestVehicleID:
    def test_split_and_trials(self, tmp_path):
        make_vehicleid(str(tmp_path))
        ds = VehicleID(root=str(tmp_path), test_size=800, seed=0)
        assert ds.num_train_pids == 13164
        # per test id: 1 gallery sample (camid 1), rest query (camid 0)
        assert len(ds.gallery) == 800
        assert len(ds.query) == 800 * 2
        assert {r.camid for r in ds.gallery} == {1}
        assert {r.camid for r in ds.query} == {0}
        g0 = [r.img_path for r in ds.gallery]
        ds.resample()
        g1 = [r.img_path for r in ds.gallery]
        assert len(g1) == 800 and g0 != g1

    def test_bad_test_size(self, tmp_path):
        make_vehicleid(str(tmp_path / "v"))
        with pytest.raises(RuntimeError):
            VehicleID(root=str(tmp_path / "v"), test_size=999)
