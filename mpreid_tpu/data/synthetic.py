"""Synthetic fixture datasets for tests and smoke runs.

Generates tiny on-disk datasets exercising each loader's path/regex logic —
the test strategy SURVEY.md §4 prescribes in place of the reference's
run-the-real-thing validation.
"""

from __future__ import annotations

import os
import os.path as osp

import numpy as np
from PIL import Image


def _write_img(path: str, seed: int, size=(32, 16), identity: int | None = None):
    os.makedirs(osp.dirname(path), exist_ok=True)
    rng = np.random.RandomState(seed)
    if identity is None:
        arr = rng.randint(0, 255, (size[0], size[1], 3), dtype=np.uint8)
    else:
        # learnable signal: a per-identity base pattern + per-image noise,
        # so retrieval metrics can actually improve with training
        base_rng = np.random.RandomState(10_000 + identity)
        base = base_rng.randint(40, 215, (size[0], size[1], 3)).astype(np.int16)
        noise = rng.randint(-40, 41, base.shape)
        arr = np.clip(base + noise, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def make_market1501(root: str, n_ids: int = 6, imgs_per_id: int = 4, n_cams: int = 6,
                    identity_signal: bool = False, size=(32, 16)):
    """Market-1501 layout: {root}/Market-1501-v15.09.15/{split}/{pid}_c{cam}s1_{i}.jpg"""
    base = osp.join(root, "Market-1501-v15.09.15")
    seed = 0
    for split, ids in (
        ("bounding_box_train", range(1, n_ids + 1)),
        ("query", range(n_ids + 1, n_ids * 2 + 1)),
        ("bounding_box_test", range(n_ids + 1, n_ids * 2 + 1)),
    ):
        for pid in ids:
            for i in range(imgs_per_id):
                cam = (i % n_cams) + 1
                _write_img(
                    osp.join(base, split, f"{pid:04d}_c{cam}s1_{i:06d}_00.jpg"), seed,
                    size=size, identity=pid if identity_signal else None,
                )
                seed += 1
    return base


def make_mmmp(root: str, exp_settings=("exp_cctv_ir_cctv_rgb", "exp_rgb"),
              n_train_ids: int = 4, n_test_ids: int = 3, imgs_per_cam: int = 2):
    """MMMP layout: {root}/{cam}/{pid}/{...}{cam:02d}_{pid:04d}_xxxx.jpg

    Filenames are built so the reference's char-offset parse
    (pid = path[-13:-9]) also works: name = f"{cam:02d}_{pid:04d}_0001.jpg"
    → suffix '_0001.jpg' is 9 chars, pid at [-13:-9]. Id-list files live in
    {root}/{exp_setting}/{train,val,test}_id.txt.
    """
    cams = [f"{i:02d}" for i in range(1, 15)]
    train_ids = list(range(1, n_train_ids + 1))
    val_ids = [n_train_ids + 1]
    test_ids = list(range(n_train_ids + 2, n_train_ids + 2 + n_test_ids))

    seed = 100
    for cam in cams:
        for pid in train_ids + val_ids + test_ids:
            for i in range(imgs_per_cam):
                name = f"{cam}_{pid:04d}_{i:04d}.jpg"
                _write_img(osp.join(root, cam, f"{pid:04d}", name), seed)
                seed += 1

    for exp_setting in exp_settings:
        exp_dir = osp.join(root, exp_setting)
        os.makedirs(exp_dir, exist_ok=True)
        for fname, ids in (
            ("train_id.txt", train_ids),
            ("val_id.txt", val_ids),
            ("test_id.txt", test_ids),
        ):
            with open(osp.join(exp_dir, fname), "w") as f:
                f.write(",".join(str(i) for i in ids) + "\n")
    return root


def make_sysu(root: str, n_train_ids: int = 4, n_test_ids: int = 3, imgs: int = 2):
    cams = ["cam1", "cam2", "cam3", "cam4", "cam5", "cam6"]
    train_ids = list(range(1, n_train_ids + 1))
    val_ids = [n_train_ids + 1]
    test_ids = list(range(n_train_ids + 2, n_train_ids + 2 + n_test_ids))
    seed = 500
    for cam in cams:
        for pid in train_ids + val_ids + test_ids:
            for i in range(imgs):
                _write_img(osp.join(root, cam, f"{pid:04d}", f"{i:04d}.jpg"), seed)
                seed += 1
    os.makedirs(osp.join(root, "exp"), exist_ok=True)
    for fname, ids in (
        ("train_id.txt", train_ids),
        ("val_id.txt", val_ids),
        ("test_id.txt", test_ids),
    ):
        with open(osp.join(root, "exp", fname), "w") as f:
            f.write(",".join(str(i) for i in ids))
    return root


def make_regdb(root: str, n_ids: int = 4, imgs: int = 2, trial: int = 1):
    seed = 900
    os.makedirs(osp.join(root, "idx"), exist_ok=True)
    for split in ("train", "test"):
        for modality, folder in (("visible", "Visible"), ("thermal", "Thermal")):
            lines = []
            for new_id in range(n_ids):
                orig = new_id + (100 if split == "test" else 0)
                for i in range(imgs):
                    rel = f"{folder}/{orig}/img_{i:05d}_{orig}.bmp"
                    _write_img(osp.join(root, rel), seed)
                    seed += 1
                    lines.append(f"{rel} {new_id}")
            with open(osp.join(root, "idx", f"{split}_{modality}_{trial}.txt"), "w") as f:
                f.write("\n".join(lines))
    return root


def make_msmt17(root: str, n_ids: int = 4, imgs: int = 3):
    base = osp.join(root, "MSMT17")
    seed = 1500
    for split_dir, lists in (("train", ["list_train.txt", "list_val.txt"]),
                             ("test", ["list_query.txt", "list_gallery.txt"])):
        per_list = {name: [] for name in lists}
        for pid in range(n_ids):
            for i in range(imgs):
                cam = (i % 3) + 1
                rel = f"{pid:04d}/{pid:04d}_{i:03d}_{cam:02d}_x.jpg"
                _write_img(osp.join(base, split_dir, rel), seed)
                seed += 1
                per_list[lists[i % len(lists)]].append(f"{rel} {pid}")
        for name, lines in per_list.items():
            with open(osp.join(base, name), "w") as f:
                f.write("\n".join(lines) + "\n")
    return base


def make_duke(root: str, occluded: bool = False, n_ids: int = 4, imgs: int = 3):
    sub = "Occluded_Duke" if occluded else "DukeMTMC-reID"
    base = osp.join(root, "dukemtmcreid", sub)
    seed = 2000
    for split, ids in (
        ("bounding_box_train", range(1, n_ids + 1)),
        ("query", range(n_ids + 1, n_ids * 2 + 1)),
        ("bounding_box_test", range(n_ids + 1, n_ids * 2 + 1)),
    ):
        for pid in ids:
            for i in range(imgs):
                cam = (i % 8) + 1
                _write_img(osp.join(base, split, f"{pid:04d}_c{cam}_f{i:07d}.jpg"), seed)
                seed += 1
    return base


def make_g2aps(root: str, n_ids: int = 4, imgs: int = 3):
    base = osp.join(root, "G2APS_in_market1501_style", "Market-1501-v15.09.15")
    seed = 2500
    for split, ids in (
        ("bounding_box_train", range(1, n_ids + 1)),
        ("query", range(n_ids + 1, n_ids * 2 + 1)),
        ("bounding_box_test", range(n_ids + 1, n_ids * 2 + 1)),
    ):
        for pid in ids:
            for i in range(imgs):
                cam = (i % 2) + 1
                _write_img(osp.join(base, split, f"{pid:04d}_c{cam}s1_{i:06d}.jpg"), seed)
                seed += 1
    return base


def make_veri(root: str, n_ids: int = 4, imgs: int = 3, n_views: int = 8):
    base = osp.join(root, "VeRi")
    os.makedirs(osp.join(base, "keypoints"), exist_ok=True)
    seed = 3000
    kp_lines = {"keypoint_train.txt": [], "keypoint_test.txt": []}
    for s_idx, (split, ids, kp) in enumerate((
        ("image_train", range(1, n_ids + 1), "keypoint_train.txt"),
        ("image_query", range(n_ids + 1, n_ids * 2 + 1), "keypoint_test.txt"),
        ("image_test", range(n_ids + 1, n_ids * 2 + 1), "keypoint_test.txt"),
    )):
        for pid in ids:
            for i in range(imgs):
                cam = (i % 20) + 1
                name = f"{pid:04d}_c{cam:03d}_{s_idx * 100 + i:08d}_0.jpg"
                _write_img(osp.join(base, split, name), seed)
                seed += 1
                viewid = (pid + i) % n_views
                kp_lines[kp].append(
                    f"{split}/{name} " + " ".join(["0"] * 5) + f" {viewid}"
                )
    for fname, lines in kp_lines.items():
        with open(osp.join(base, "keypoints", fname), "w") as f:
            f.write("\n".join(lines) + "\n")
    return base


def make_agreid(root: str, exp_setting: str = "exp1", n_ids: int = 4, imgs: int = 2):
    seed = 4000
    query_lines, gallery_lines = [], []
    # identity = concat(P, T, A) digits — keep T/A fixed per pid so each
    # pid is one identity (matches AG-ReID naming where T/A encode the
    # tracklet consistently per id)
    for pid in range(1, n_ids + 1):
        for i in range(imgs):
            name = f"P{pid:04d}T01A{pid:02d}C{i % 3}F{i:03d}.jpg"
            _write_img(osp.join(root, "train_all", f"{pid:04d}", name), seed)
            seed += 1
    for pid in range(n_ids + 1, n_ids * 2 + 1):
        for i in range(imgs):
            name = f"P{pid:04d}T01A{pid:02d}C{i % 3}F{i:03d}.jpg"
            rel_q = f"query/{name}"
            rel_g = f"gallery/{name}"
            _write_img(osp.join(root, rel_q), seed)
            seed += 1
            _write_img(osp.join(root, rel_g), seed)
            seed += 1
            query_lines.append(rel_q)
            gallery_lines.append(rel_g)
    with open(osp.join(root, f"{exp_setting}.txt"), "w") as f:
        f.write("\n".join(query_lines + gallery_lines) + "\n")
    return root


def make_vehicleid(root: str, n_train_ids: int = 13164, n_test_ids: int = 800):
    """VehicleID layout (full-size id lists, tiny image count).

    The loader asserts 13164 train ids / exact test-list size, so the lists
    are written full-size but only the first few ids get real image files —
    fine for split-logic tests that don't decode images.
    """
    base = osp.join(root, "VehicleID_V1.0")
    split = osp.join(base, "train_test_split")
    os.makedirs(osp.join(base, "image"), exist_ok=True)
    os.makedirs(split, exist_ok=True)
    with open(osp.join(split, "train_list.txt"), "w") as f:
        for pid in range(n_train_ids):
            f.write(f"tr{pid:06d} {pid}\n")
    with open(osp.join(split, f"test_list_{n_test_ids}.txt"), "w") as f:
        for pid in range(n_test_ids):
            for i in range(3):
                f.write(f"te{pid:06d}_{i} {100000 + pid}\n")
    return base
