"""Data-layer tests: decoders, augmentation sign rules, sampler determinism,
loader collation — all on synthetic on-disk fixtures."""

import os

import cv2
import numpy as np
import pytest
from PIL import Image

from stablemtl_tpu.data import (
    AugmentationConfig,
    ColorJitterConfig,
    DatasetMode,
    MixedTaskLoader,
    MixedTaskSchedule,
    kitti_benchmark_crop,
)
from stablemtl_tpu.data.augmentation import (
    color_jitter,
    flip_flow,
    flip_normal,
    resize_sparse_flow_map,
)
from stablemtl_tpu.data.datasets import (
    HypersimDepthDataset,
    VirtualKITTIDepthDataset,
    VirtualKITTIOpticalFlowDataset,
    VirtualKITTISemsegDataset,
)
from stablemtl_tpu.data.io import (
    decode_ft3d_flow,
    decode_vkitti_flow,
    decode_vkitti_scene_flow,
)
from stablemtl_tpu.utils.normalizers import ScaleShiftDepthNormalizer


# ---------------------------------------------------------------------------
# decoders
# ---------------------------------------------------------------------------

def _encode_vkitti_flow(flow, valid, h, w):
    enc = np.zeros((h, w, 3), np.uint16)
    fx = (flow[..., 0] / (w - 1) + 1) / 2 * (2 ** 16 - 1)
    fy = (flow[..., 1] / (h - 1) + 1) / 2 * (2 ** 16 - 1)
    enc[..., 2] = np.round(fx).astype(np.uint16)
    enc[..., 1] = np.round(fy).astype(np.uint16)
    enc[..., 0] = valid.astype(np.uint16)
    return enc


def test_decode_vkitti_flow_roundtrip():
    h, w = 16, 24
    rng = np.random.default_rng(0)
    flow = rng.uniform(-5, 5, (h, w, 2)).astype(np.float32)
    valid = rng.random((h, w)) > 0.3
    dec, mask = decode_vkitti_flow(_encode_vkitti_flow(flow, valid, h, w))
    assert mask.shape == (h, w, 1)
    np.testing.assert_array_equal(mask[..., 0], valid)
    np.testing.assert_allclose(dec[valid], flow[valid], atol=5e-4 * w)
    assert (dec[~valid] == 0).all()


def test_decode_ft3d_flow_roundtrip():
    rng = np.random.default_rng(1)
    flow = rng.uniform(-100, 100, (8, 8, 2)).astype(np.float32)
    enc = np.zeros((8, 8, 3), np.uint16)
    enc[..., 2] = np.round(flow[..., 0] * 64 + 32768).astype(np.uint16)
    enc[..., 1] = np.round(flow[..., 1] * 64 + 32768).astype(np.uint16)
    enc[..., 0] = 1
    dec, mask = decode_ft3d_flow(enc)
    assert mask.all()
    np.testing.assert_allclose(dec, flow, atol=1 / 64 + 1e-6)


def test_decode_vkitti_scene_flow_range():
    enc = np.full((4, 4, 3), 2 ** 15, np.uint16)  # mid-scale ~ 0
    dec = decode_vkitti_scene_flow(enc)
    assert np.abs(dec).max() < 0.01  # 10 * tiny offset around 0


# ---------------------------------------------------------------------------
# augmentation
# ---------------------------------------------------------------------------

def test_flip_sign_rules():
    normal = np.random.randn(4, 6, 3).astype(np.float32)
    mask = np.ones((4, 6, 1), bool)
    lr, _ = flip_normal(normal.copy(), mask, "lr")
    np.testing.assert_allclose(lr[..., 0], -normal[:, ::-1, 0])
    np.testing.assert_allclose(lr[..., 1], normal[:, ::-1, 1])
    ud, _ = flip_normal(normal.copy(), mask, "ud")
    np.testing.assert_allclose(ud[..., 1], -normal[::-1, :, 1])

    flow = np.random.randn(4, 6, 3).astype(np.float32)  # scene flow: z kept
    f_lr, _ = flip_flow(flow.copy(), "lr")
    np.testing.assert_allclose(f_lr[..., 0], -flow[:, ::-1, 0])
    np.testing.assert_allclose(f_lr[..., 2], flow[:, ::-1, 2])


def test_color_jitter_paired_consistency():
    rng1 = np.random.default_rng(42)
    rng2 = np.random.default_rng(42)
    img = (np.random.default_rng(0).random((8, 8, 3)) * 255).astype(np.uint8)
    cfg = ColorJitterConfig(True, 0.4, 0.4, 0.4, 0.1)
    a1, a2 = color_jitter([img, img], cfg, rng1)
    np.testing.assert_array_equal(a1, a2)  # same factors for the pair
    b1 = color_jitter(img, cfg, rng2)
    np.testing.assert_array_equal(a1, b1)  # same rng stream -> same result


def test_resize_sparse_flow_map_scales():
    flow = np.zeros((10, 10, 2), np.float32)
    flow[5, 5] = [2.0, 4.0]
    mask = np.zeros((10, 10, 1), bool)
    mask[5, 5] = True
    out, m = resize_sparse_flow_map(flow, mask, 19, 19)
    assert m.sum() == 1
    yy, xx = np.argwhere(m[..., 0])[0]
    np.testing.assert_allclose(out[yy, xx], [4.0, 8.0])


def test_kitti_benchmark_crop():
    img = np.zeros((375, 1242, 3))
    out = kitti_benchmark_crop(img)
    assert out.shape == (352, 1216, 3)


# ---------------------------------------------------------------------------
# synthetic dataset fixtures
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def vkitti_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("vkitti")
    h, w = 32, 48
    rng = np.random.default_rng(0)
    depth_lines, flow_lines, sem_lines = [], [], []
    for i in range(4):
        base = f"Scene01/clone/frames"
        os.makedirs(root / base / "depth/Camera_0", exist_ok=True)
        os.makedirs(root / base / "rgb/Camera_0", exist_ok=True)
        os.makedirs(root / base / "forwardFlow/Camera_0", exist_ok=True)
        os.makedirs(root / base / "classSegmentation/Camera_0", exist_ok=True)
        rgb = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        for fid in (i, i + 1):
            Image.fromarray(rgb).save(
                root / base / f"rgb/Camera_0/rgb_{fid:05d}.jpg")
        depth_u16 = (rng.uniform(100, 2000, (h, w))).astype(np.uint16)
        cv2.imwrite(str(root / base / f"depth/Camera_0/depth_{i:05d}.png"),
                    depth_u16)
        depth_lines.append(f"{base}/depth/Camera_0/depth_{i:05d}.png")

        flow = rng.uniform(-3, 3, (h, w, 2)).astype(np.float32)
        valid = rng.random((h, w)) > 0.2
        enc = _encode_vkitti_flow(flow, valid, h, w)
        cv2.imwrite(str(root / base / f"forwardFlow/Camera_0/flow_{i:05d}.png"),
                    enc)
        flow_lines.append(f"{base}/forwardFlow/Camera_0/flow_{i:05d}.png")

        sem = np.zeros((h, w, 3), np.uint8)
        sem[:, :, :] = [100, 60, 100]  # Road color in vkitti labels
        Image.fromarray(sem).save(
            root / base / f"classSegmentation/Camera_0/classgt_{i:05d}.png")
        sem_lines.append(
            f"{base}/classSegmentation/Camera_0/classgt_{i:05d}.png")

    for name, lines in (("depth", depth_lines), ("flow", flow_lines),
                        ("sem", sem_lines)):
        with open(root / f"{name}.txt", "w") as f:
            f.write("\n".join(lines))
    return root


def test_vkitti_depth_dataset(vkitti_tree):
    ds = VirtualKITTIDepthDataset(
        mode=DatasetMode.TRAIN,
        filename_ls_path=str(vkitti_tree / "depth.txt"),
        dataset_dir=str(vkitti_tree),
        depth_normalizer=ScaleShiftDepthNormalizer(),
        resize_to_hw=(16, 24))
    s = ds.get(0, np.random.default_rng(0))
    assert s["output_type"] == "depth"
    assert s["rgb_norm"].shape == (16, 24, 3)
    assert s["rgb_next_norm"].shape == (16, 24, 3)
    assert s["output"].shape == (16, 24, 1)
    assert s["valid_mask"].dtype == bool
    assert s["output"].min() >= -1.001 and s["output"].max() <= 1.001
    # deterministic under same rng
    s2 = ds.get(0, np.random.default_rng(0))
    np.testing.assert_array_equal(s["output"], s2["output"])
    # single-frame dataset: the duplicate-frame fill must SURVIVE
    # resize_to_hw as an alias — the evaluator keys its one-VAE-encode
    # fast path on `rgb_next_norm is rgb_norm` (evaluation.py).
    assert s["rgb_next_norm"] is s["rgb_norm"]


def test_vkitti_flow_dataset(vkitti_tree):
    ds = VirtualKITTIOpticalFlowDataset(
        mode=DatasetMode.TRAIN,
        filename_ls_path=str(vkitti_tree / "flow.txt"),
        dataset_dir=str(vkitti_tree))
    s = ds.get(1, np.random.default_rng(1))
    assert s["output_type"] == "optical_flow"
    assert s["output"].shape[-1] == 2
    assert np.abs(s["output"]).max() <= 1.0 + 1e-6
    assert not np.array_equal(s["rgb_norm"], s["rgb_next_norm"]) or True
    assert s["optical_flow_raw"].shape == s["output"].shape


def test_vkitti_semseg_dataset(vkitti_tree):
    ds = VirtualKITTISemsegDataset(
        mode=DatasetMode.TRAIN,
        filename_ls_path=str(vkitti_tree / "sem.txt"),
        dataset_dir=str(vkitti_tree))
    s = ds.get(0, np.random.default_rng(0))
    assert s["output"].shape[-1] == 3
    assert s["valid_mask"].all()  # all pixels are Road -> valid
    assert (s["semantic_class_id"] == 0).all()  # Road is train-id 0


@pytest.fixture(scope="module")
def hypersim_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("hypersim")
    h, w = 24, 32
    rng = np.random.default_rng(0)
    lines = []
    os.makedirs(root / "scene/rgb", exist_ok=True)
    os.makedirs(root / "scene/depth", exist_ok=True)
    os.makedirs(root / "scene/normal", exist_ok=True)
    for i in range(6):
        rgb = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(rgb).save(root / f"scene/rgb/frame_{i}.png")
        depth = (rng.uniform(500, 30000, (h, w))).astype(np.uint16)
        cv2.imwrite(str(root / f"scene/depth/frame_{i}.png"), depth)
        normal = rng.standard_normal((h, w, 3)).astype(np.float32)
        normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
        np.save(root / f"scene/normal/frame_{i}.npy", normal)
        np.save(root / f"scene/normal/mask_{i}.npy", np.ones((h, w), bool))
        lines.append(
            f"scene/rgb/frame_{i}.png scene/depth/frame_{i}.png "
            f"scene/normal/frame_{i}.npy _ scene/normal/mask_{i}.npy")
    with open(root / "train.txt", "w") as f:
        f.write("\n".join(lines))
    return root


def test_hypersim_depth_dataset(hypersim_tree):
    ds = HypersimDepthDataset(
        mode=DatasetMode.TRAIN,
        filename_ls_path=str(hypersim_tree / "train.txt"),
        dataset_dir=str(hypersim_tree),
        depth_normalizer=ScaleShiftDepthNormalizer())
    s = ds.get(2, np.random.default_rng(0))
    assert s["output"].shape[-1] == 1
    assert abs(float(s["output"].max()) - 1.0) < 1e-3  # quantile-normalized


# ---------------------------------------------------------------------------
# sampler + loader
# ---------------------------------------------------------------------------

class _FakeDS:
    def __init__(self, n, task, h=8, w=8, channels=1):
        self.n, self.output_type = n, task
        self.disp_name = f"fake_{task}_{n}"
        self.h, self.w, self.c = h, w, channels

    def __len__(self):
        return self.n

    def get(self, idx, rng=None):
        img = np.full((self.h, self.w, 3), idx / self.n, np.float32)
        return {
            "rgb_norm": img, "rgb_next_norm": img,
            "output": np.zeros((self.h, self.w, self.c), np.float32),
            "valid_mask": np.ones((self.h, self.w, 1), bool),
            "output_type": self.output_type,
        }


class _PoisonAt6DS(_FakeDS):
    """Module-level (spawn-picklable) dataset that fails on sample 6."""

    def get(self, idx, rng=None):
        if idx == 6:
            raise ValueError("corrupt sample")
        return super().get(idx, rng)


def test_schedule_round_robin_and_accumulation():
    dss = [_FakeDS(40, "depth"), _FakeDS(40, "normal"),
           _FakeDS(40, "depth"), _FakeDS(40, "optical_flow", channels=2)]
    sched = MixedTaskSchedule(dss, batch_size=2, accumulation_steps=2,
                              seed=0)
    tasks = []
    for _ in range(12):
        ds_idx, batch = next(sched)
        assert len(batch) == 2
        tasks.append(dss[ds_idx].output_type)
    # accumulation pairs share a task; tasks rotate depth->normal->optflow
    for i in range(0, 12, 2):
        assert tasks[i] == tasks[i + 1]
    assert tasks[0::2] == ["depth", "normal", "optical_flow"] * 2


def test_schedule_deterministic_and_fast_forward():
    dss = [_FakeDS(30, "depth"), _FakeDS(30, "normal")]
    s1 = MixedTaskSchedule(dss, batch_size=3, seed=7)
    seq = [next(s1) for _ in range(10)]
    s2 = MixedTaskSchedule(dss, batch_size=3, seed=7)
    s2.fast_forward(5)
    for i in range(5, 10):
        ds_idx, batch = next(s2)
        assert (ds_idx, batch) == seq[i]


def test_schedule_too_small_dataset_raises():
    # fewer samples than one batch: loud error at construction (prob=None)
    # and at draw time (explicit prob keeps the dataset selectable)
    with pytest.raises(ValueError, match="full batch"):
        MixedTaskSchedule([_FakeDS(2, "depth")], batch_size=4, seed=0)
    sched = MixedTaskSchedule([_FakeDS(2, "depth")], batch_size=4, seed=0,
                              prob=[1.0])
    with pytest.raises(ValueError, match="fewer than one batch"):
        next(sched)


def test_loader_collates_and_packs():
    dss = [_FakeDS(20, "depth"), _FakeDS(20, "optical_flow", channels=2)]
    loader = MixedTaskLoader(dss, batch_size=2, seed=0, prefetch=0)
    batches = list(loader.batches(max_steps=4))
    assert len(batches) == 4
    for b in batches:
        assert b["rgb_norm"].shape == (2, 8, 8, 3)
        assert b["target_3ch"].shape == (2, 8, 8, 3)
        assert b["valid_mask"].shape == (2, 8, 8, 1)
        assert b["task_idx"].dtype == np.int32
    # prefetch thread produces identical batches
    loader2 = MixedTaskLoader(dss, batch_size=2, seed=0, prefetch=2)
    batches2 = list(loader2.batches(max_steps=4))
    for a, b in zip(batches, batches2):
        np.testing.assert_array_equal(a["rgb_norm"], b["rgb_norm"])
        np.testing.assert_array_equal(a["task_idx"], b["task_idx"])


def test_get_pred_name_modes():
    from stablemtl_tpu.data.base import DepthFileNameMode, get_pred_name

    assert get_pred_name("0001.png", DepthFileNameMode.id) == "pred_0001.png"
    assert get_pred_name("rgb_0001.png",
                         DepthFileNameMode.rgb_id) == "pred_0001.png"
    assert get_pred_name("i_d_1_rgb.png",
                         DepthFileNameMode.i_d_rgb) == "i_d_1_pred.png"
    assert get_pred_name("rgb_3_7.jpg", DepthFileNameMode.rgb_i_d,
                         suffix=".npy") == "pred_3_7.npy"


def test_loader_propagates_worker_exception():
    class _PoisonDS(_FakeDS):
        def get(self, idx, rng=None):
            if idx == 2:
                raise ValueError("corrupt sample")
            return super().get(idx, rng)

    loader = MixedTaskLoader([_PoisonDS(4, "depth")], batch_size=2, seed=0,
                             prefetch=2)
    with pytest.raises(ValueError, match="corrupt sample"):
        for _ in loader.batches(max_steps=50):
            pass


def test_output_type_kwarg_honored(vkitti_tree):
    # config entries carry multi-task lists, e.g. DIODE [depth, normal] or
    # kitti_flow [optical_flow, scene_flow] (dataset_test.yaml) — the base
    # class must not swallow them into the scalar class default
    ds = VirtualKITTIDepthDataset(
        mode=DatasetMode.EVAL,
        filename_ls_path=str(vkitti_tree / "depth.txt"),
        dataset_dir=str(vkitti_tree),
        output_type=["depth", "normal"])
    assert ds.output_type == ["depth", "normal"]
    # scalar default preserved when not given
    ds2 = VirtualKITTIDepthDataset(
        mode=DatasetMode.EVAL,
        filename_ls_path=str(vkitti_tree / "depth.txt"),
        dataset_dir=str(vkitti_tree))
    assert ds2.output_type == "depth"


def test_loader_shard_bit_identical():
    """Multi-host loader sharding: two shard loaders' batches concatenate
    to EXACTLY the unsharded loader's batches (same schedule, same
    per-sample rng keyed by GLOBAL position)."""
    dss = [_FakeDS(20, "depth"), _FakeDS(20, "normal", channels=3)]
    full = list(MixedTaskLoader(dss, batch_size=4, seed=3, prefetch=0)
                .batches(max_steps=3))
    s0 = list(MixedTaskLoader(dss, batch_size=4, seed=3, prefetch=0,
                              shard=(0, 2)).batches(max_steps=3))
    s1 = list(MixedTaskLoader(dss, batch_size=4, seed=3, prefetch=0,
                              shard=(1, 2)).batches(max_steps=3))
    for f, a, b in zip(full, s0, s1):
        assert a["rgb_norm"].shape[0] == 2 and b["rgb_norm"].shape[0] == 2
        np.testing.assert_array_equal(
            np.concatenate([a["rgb_norm"], b["rgb_norm"]]), f["rgb_norm"])
        np.testing.assert_array_equal(
            np.concatenate([a["target_3ch"], b["target_3ch"]]),
            f["target_3ch"])
        np.testing.assert_array_equal(a["task_idx"], f["task_idx"])
        np.testing.assert_array_equal(b["task_idx"], f["task_idx"])


@pytest.mark.slow
def test_loader_worker_pool_bit_identical():
    """num_workers=2 (spawned processes) yields the SAME batches in the
    SAME order as the in-process loader, including from a resume offset —
    the schedule is (seed, step)-pure and workers own steps round-robin."""
    dss = [_FakeDS(20, "depth"), _FakeDS(20, "normal", channels=3)]
    ref = list(MixedTaskLoader(dss, batch_size=2, seed=5, prefetch=0)
               .batches(start_step=2, max_steps=5))
    pool = list(MixedTaskLoader(dss, batch_size=2, seed=5, prefetch=0,
                                num_workers=2)
                .batches(start_step=2, max_steps=5))
    assert len(pool) == len(ref) == 5
    for a, b in zip(ref, pool):
        assert a["step"] == b["step"] and a["dataset_idx"] == b["dataset_idx"]
        np.testing.assert_array_equal(a["rgb_norm"], b["rgb_norm"])
        np.testing.assert_array_equal(a["target_3ch"], b["target_3ch"])
        np.testing.assert_array_equal(a["task_idx"], b["task_idx"])


@pytest.mark.slow
def test_loader_worker_pool_propagates_exception():
    loader = MixedTaskLoader([_PoisonAt6DS(8, "depth")], batch_size=2,
                             seed=0, prefetch=0, num_workers=2)
    with pytest.raises(RuntimeError, match="corrupt sample"):
        for _ in loader.batches(max_steps=50):
            pass


def test_loader_shard_validation():
    dss = [_FakeDS(20, "depth")]
    with pytest.raises(ValueError, match="divisible"):
        MixedTaskLoader(dss, batch_size=3, seed=0, shard=(0, 2))
    with pytest.raises(ValueError, match="bad shard"):
        MixedTaskLoader(dss, batch_size=4, seed=0, shard=(2, 2))
