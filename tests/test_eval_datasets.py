"""Synthetic-tree tests for the five eval datasets that round-1 left
uncovered: KITTI flow 2015 (optical + derived scene flow), FlyingThings3D
optical/scene flow, Cityscapes semantic, and MID-Intrinsics — plus an
Evaluator integration run producing all 7 headline task rows from real
dataset classes (VERDICT round-1 item 2).

Reference anchors: kitti_flow_dataset.py:64-142, flyingthings3d_dataset.py
:118-201, cityscapes_dataset.py:30-61, mid_intrinsic_dataset.py:11-62.
"""

import os

import cv2
import numpy as np
import pytest
from PIL import Image

from stablemtl_tpu.data import DatasetMode
from stablemtl_tpu.data.datasets import (
    CityscapesDataset,
    FlyingThings3DOpticalFlowDataset,
    FlyingThings3DSceneFlowDataset,
    KittiFlowDataset,
    MIDIntrinsicDataset,
)
from stablemtl_tpu.evaluation import Evaluator
from stablemtl_tpu.pipeline import TASKS


def _write_lines(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines))


def _write_flow_png(path, flow, valid):
    """KITTI/FT3D 16-bit packing: ch2=u*64+32768, ch1=v*64+32768, ch0=valid."""
    h, w = flow.shape[:2]
    enc = np.zeros((h, w, 3), np.uint16)
    enc[..., 2] = np.round(flow[..., 0] * 64 + 32768).astype(np.uint16)
    enc[..., 1] = np.round(flow[..., 1] * 64 + 32768).astype(np.uint16)
    enc[..., 0] = valid.astype(np.uint16)
    assert cv2.imwrite(str(path), enc)


# ---------------------------------------------------------------------------
# KITTI flow 2015
# ---------------------------------------------------------------------------

KITTI_FX, KITTI_CX, KITTI_CY = 721.5377, 609.5593, 172.854


@pytest.fixture(scope="module")
def kitti_flow_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_flow")
    h, w = 375, 1242
    rng = np.random.default_rng(3)
    for sub in ("flow_occ", "image_2", "disp_occ_0", "disp_occ_1",
                "calib_cam_to_cam"):
        os.makedirs(root / sub, exist_ok=True)
    rgb = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    Image.fromarray(rgb).save(root / "image_2/000000_10.png")
    Image.fromarray(rgb).save(root / "image_2/000000_11.png")

    flow = np.zeros((h, w, 2), np.float32)
    flow[:, :, 0] = 1.5  # constant horizontal motion
    valid = np.ones((h, w), bool)
    valid[-5:] = False  # invalid rows inside the benchmark crop (bottom)
    _write_flow_png(root / "flow_occ/000000_10.png", flow, valid)

    # disp1 = 64 px, disp2 = 32 px -> depth doubles between frames
    disp1 = np.full((h, w), 64 * 256, np.uint16)
    disp2 = np.full((h, w), 32 * 256, np.uint16)
    disp2[:, :3] = 0  # invalid disparity columns
    assert cv2.imwrite(str(root / "disp_occ_0/000000_10.png"), disp1)
    assert cv2.imwrite(str(root / "disp_occ_1/000000_10.png"), disp2)

    _write_lines(root / "calib_cam_to_cam/000000.txt", [
        "calib_time: 09-Jan-2012 13:57:47",
        f"P_rect_02: {KITTI_FX} 0.0 {KITTI_CX} 44.857 "
        f"0.0 {KITTI_FX} {KITTI_CY} 0.216 0.0 0.0 1.0 0.0027",
    ])
    _write_lines(root / "split.txt", ["flow_occ/000000_10.png"])
    return root


def test_kitti_flow_dataset(kitti_flow_tree):
    ds = KittiFlowDataset(
        mode=DatasetMode.EVAL,
        filename_ls_path=str(kitti_flow_tree / "split.txt"),
        dataset_dir=str(kitti_flow_tree),
        output_type=["optical_flow", "scene_flow"],
    )
    assert len(ds) == 1
    s = ds.get(0)
    # kitti benchmark crop applied to every raster
    assert s["rgb_norm"].shape == (352, 1216, 3)
    assert s["rgb_next_norm"].shape == (352, 1216, 3)
    assert s["optical_flow_raw"].shape == (352, 1216, 2)
    assert s["valid_mask"].shape == (352, 1216, 1)
    assert s["scene_flow"].shape == (352, 1216, 3)
    assert s["scene_flow_valid_mask"].shape == (352, 1216, 1)
    assert s["output_type"] == ["optical_flow", "scene_flow"]

    m = s["valid_mask"][..., 0]
    assert m.any() and not m.all()
    np.testing.assert_allclose(s["optical_flow_raw"][m][:, 0], 1.5, atol=1e-5)
    np.testing.assert_allclose(s["optical_flow_raw"][m][:, 1], 0.0, atol=1e-5)

    # scene-flow derivation: depth_i = baseline * fx / disp_i
    # (kitti_flow_dataset.py:64-85); disp 64 -> 32 doubles the depth.
    sm = s["scene_flow_valid_mask"][..., 0]
    assert sm.any()
    assert np.isfinite(s["scene_flow"]).all()
    d1 = 0.54 * KITTI_FX / 64.0
    sf_z = s["scene_flow"][sm][:, 2]
    np.testing.assert_allclose(sf_z, d1, rtol=1e-3)
    # invalid-disparity columns are masked out (crop removes 13 left cols)
    assert np.isfinite(s["scene_flow"][~sm]).all()


def test_kitti_flow_calib_parse():
    txt = ("S_rect_02: 1.2 3.4\n"
           f"P_rect_02: {KITTI_FX} 0.0 {KITTI_CX} 44.8 0.0 {KITTI_FX} "
           f"{KITTI_CY} 0.2 0.0 0.0 1.0 0.002\n")
    proj = KittiFlowDataset.load_calib(txt)
    assert proj.shape == (3, 4)
    assert proj[0, 0] == proj[1, 1] == np.float32(KITTI_FX)
    assert proj[0, 2] == np.float32(KITTI_CX)
    with pytest.raises(ValueError):
        KittiFlowDataset.load_calib("R_rect_02: 1 0 0\n")


# ---------------------------------------------------------------------------
# FlyingThings3D
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ft3d_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("ft3d")
    h, w = 540, 960
    rng = np.random.default_rng(5)
    for sub in ("image_clean", "flow_2d", "pc", "flow_3d"):
        os.makedirs(root / sub, exist_ok=True)
    rgb = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    Image.fromarray(rgb).save(root / "image_clean/0000000.png")
    Image.fromarray(rgb).save(root / "image_clean/0000001.png")

    flow = rng.uniform(-20, 20, (h, w, 2)).astype(np.float32)
    valid = rng.random((h, w)) > 0.1
    _write_flow_png(root / "flow_2d/0000000.png", flow, valid)

    # point cloud exactly on the pixel grid so the 3D->2D scatter is exact:
    # x = (u - cx) * z / f, y = (v - cy) * z / f  (f, cx, cy of the class)
    f, cx, cy = 1050.0, 479.5, 269.5
    z = rng.uniform(5.0, 30.0, (h, w)).astype(np.float32)
    uu, vv = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    pc1 = np.stack([(uu - cx) * z / f, (vv - cy) * z / f, z], -1)
    flow_3d = rng.uniform(-1, 1, (h, w, 3)).astype(np.float32)
    np.savez(root / "pc/0000000.npz", pc1=pc1.reshape(-1, 3))
    np.save(root / "flow_3d/0000000.npy", flow_3d.reshape(-1, 3))

    _write_lines(root / "split.txt", ["flow_2d/0000000.png"])
    return root, flow, valid, flow_3d


def test_ft3d_optical_flow_dataset(ft3d_tree):
    root, flow, valid, _ = ft3d_tree
    ds = FlyingThings3DOpticalFlowDataset(
        mode=DatasetMode.EVAL,
        filename_ls_path=str(root / "split.txt"),
        dataset_dir=str(root),
    )
    s = ds.get(0)
    # 960x536 center crop (flyingthings3d_dataset.py:27,56-60)
    assert s["rgb_norm"].shape == (536, 960, 3)
    assert s["optical_flow_raw"].shape == (536, 960, 2)
    assert s["output"].shape == (536, 960, 2)
    m = s["valid_mask"][..., 0]
    crop_flow = flow[2:538]
    crop_valid = valid[2:538]
    np.testing.assert_array_equal(m, crop_valid)
    np.testing.assert_allclose(s["optical_flow_raw"][m], crop_flow[m],
                               atol=1 / 64 + 1e-5)
    # "hw" normalization bounds the packed target to [-1, 1]
    assert np.abs(s["output"]).max() <= 1.0 + 1e-6


def test_ft3d_scene_flow_dataset(ft3d_tree):
    root, _, _, flow_3d = ft3d_tree
    ds = FlyingThings3DSceneFlowDataset(
        mode=DatasetMode.EVAL,
        filename_ls_path=str(root / "split.txt"),
        dataset_dir=str(root),
    )
    s = ds.get(0)
    assert s["scene_flow"].shape == (536, 960, 3)
    assert s["output"].shape == (536, 960, 3)
    m = s["valid_mask"][..., 0]
    # pc1 lies exactly on the pixel grid of the UNCROPPED image; points whose
    # rounded projection lands inside the cropped frame scatter their flow_3d
    # (flyingthings3d_dataset.py:157-181). Spot-check a valid interior pixel.
    assert m.sum() > 0.9 * m.size * 0.9
    ys, xs = np.nonzero(m)
    yy, xx = ys[len(ys) // 2], xs[len(xs) // 2]
    row = np.flatnonzero(
        (np.abs(flow_3d.reshape(-1, 3) - s["scene_flow"][yy, xx]) < 1e-6)
        .all(-1))
    assert row.size >= 1
    assert np.isfinite(s["scene_flow"]).all()


# ---------------------------------------------------------------------------
# Cityscapes
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def cityscapes_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("cityscapes")
    h, w = 64, 128
    os.makedirs(root / "leftImg8bit/val/foo", exist_ok=True)
    os.makedirs(root / "gtFine/val/foo", exist_ok=True)
    rng = np.random.default_rng(7)
    rgb = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    Image.fromarray(rgb).save(
        root / "leftImg8bit/val/foo/foo_000000_leftImg8bit.png")
    labels = np.zeros((h, w), np.uint8)  # 0 = unlabeled -> ignore
    labels[: h // 2] = 7   # road -> train id 0
    labels[h // 2:, : w // 2] = 23  # sky -> some valid class
    Image.fromarray(labels).save(
        root / "gtFine/val/foo/foo_000000_gtFine_labelIds.png")
    _write_lines(root / "split.txt",
                 ["leftImg8bit/val/foo/foo_000000_leftImg8bit.png"])
    return root


def test_cityscapes_dataset(cityscapes_tree):
    ds = CityscapesDataset(
        mode=DatasetMode.EVAL,
        filename_ls_path=str(cityscapes_tree / "split.txt"),
        dataset_dir=str(cityscapes_tree),
    )
    s = ds.get(0)
    # half resolution (cityscapes_dataset.py:30-36)
    assert s["rgb_norm"].shape == (32, 64, 3)
    assert s["semantic_class_id"].shape == (32, 64, 1)
    assert s["output"].shape == (32, 64, 3)
    cid = s["semantic_class_id"][..., 0]
    assert (cid[:16] == 0).all()            # road
    assert (cid[16:, 32:] == 250).all()     # unlabeled -> ignore_index
    assert (cid[16:, :32] < 8).all()        # sky mapped to a train id
    m = s["valid_mask"][..., 0]
    np.testing.assert_array_equal(m, cid != 250)
    # the packed target is the class color embedding in [-1, 1]
    assert np.abs(s["output"]).max() <= 1.0


# ---------------------------------------------------------------------------
# MID-Intrinsics
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mid_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("mid")
    h, w = 48, 64
    rng = np.random.default_rng(9)
    img = (rng.random((h, w, 3)) * 200 + 30).astype(np.uint8)
    albedo = np.full((h, w, 3), 140, np.uint8)
    albedo[:8, :8] = 0  # below the 0.004 valid-albedo threshold
    shading = np.full((h, w, 3), 90, np.uint8)
    Image.fromarray(img).save(root / "a.jpg", quality=98)
    Image.fromarray(albedo).save(root / "a_albedo.jpg", quality=98)
    Image.fromarray(shading).save(root / "a_shading.jpg", quality=98)
    _write_lines(root / "split.txt", ["a.jpg"])
    return root


def test_mid_intrinsic_dataset(mid_tree):
    ds = MIDIntrinsicDataset(
        mode=DatasetMode.EVAL,
        filename_ls_path=str(mid_tree / "split.txt"),
        dataset_dir=str(mid_tree),
        output_type=["albedo", "shading"],
    )
    s = ds.get(0)
    h, w = s["rgb_norm"].shape[:2]
    assert s["albedo"].shape == (h, w, 3)
    assert 0.0 <= s["albedo"].min() and s["albedo"].max() <= 1.0
    # shading is CCIR601 brightness, single channel (dataset/utils.py:5-24)
    assert s["shading"].shape == (h, w, 1)
    np.testing.assert_allclose(s["shading"], 90 / 255.0, atol=0.05)
    # albedo<0.004 block invalid; shading shares the albedo mask
    # (mid_intrinsic_dataset.py:56-58)
    mask = s["albedo_valid_mask"]
    assert not mask[2, 2, 0] and mask[20, 20, 0]
    np.testing.assert_array_equal(mask, s["shading_valid_mask"])


# ---------------------------------------------------------------------------
# Evaluator over the real eval dataset classes (all 7 headline rows)
# ---------------------------------------------------------------------------

def test_evaluator_runs_all_seven_rows(kitti_flow_tree, cityscapes_tree,
                                       mid_tree, tmp_path):
    """Every protocol row (dataset_test.yaml) produces finite metrics from a
    real dataset class through alignment + the metric stack."""
    from stablemtl_tpu.data.semantic import CityscapesEncoder
    from stablemtl_tpu.data.datasets import DIODEDataset, KITTIDataset
    from tests.test_eval_integration import _make_diode_tree, _make_kitti_tree

    rng = np.random.default_rng(11)

    def random_infer(rgb, rgb_next, task_idx):
        return rng.uniform(-1, 1, rgb.shape).astype(np.float32)

    enc = CityscapesEncoder(n_classes=8)
    ev = Evaluator(infer_fn=random_infer,
                   class_colors=enc.class_color_embeddings)

    diode_root = _make_diode_tree(tmp_path / "diode")
    kitti_root = _make_kitti_tree(tmp_path / "kitti")

    rows = [
        (DIODEDataset(mode=DatasetMode.EVAL,
                      filename_ls_path=str(diode_root / "split.txt"),
                      dataset_dir=str(diode_root), min_depth=0.6,
                      max_depth=350.0),
         ["depth", "normal"]),
        (KITTIDataset(mode=DatasetMode.EVAL,
                      filename_ls_path=str(kitti_root / "split.txt"),
                      dataset_dir=str(kitti_root), min_depth=1e-5,
                      max_depth=80.0),
         ["depth"]),
        (CityscapesDataset(mode=DatasetMode.EVAL,
                           filename_ls_path=str(cityscapes_tree / "split.txt"),
                           dataset_dir=str(cityscapes_tree)),
         ["semantic"]),
        (KittiFlowDataset(mode=DatasetMode.EVAL,
                          filename_ls_path=str(kitti_flow_tree / "split.txt"),
                          dataset_dir=str(kitti_flow_tree),
                          output_type=["optical_flow", "scene_flow"]),
         None),  # from dataset.output_type list
        (MIDIntrinsicDataset(mode=DatasetMode.EVAL,
                             filename_ls_path=str(mid_tree / "split.txt"),
                             dataset_dir=str(mid_tree),
                             output_type=["albedo", "shading"]),
         None),
    ]
    seen = set()
    for ds, tasks in rows:
        res = ev.evaluate(ds, tasks=tasks)
        for task, vals in res.items():
            assert task in TASKS
            seen.add(task)
            assert vals, f"empty metrics for {task}"
            for k, v in vals.items():
                assert np.isfinite(v), f"{task}.{k} not finite: {v}"
    assert seen == set(TASKS), f"missing rows: {set(TASKS) - seen}"
