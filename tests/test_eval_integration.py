"""EVAL-mode integration: real dataset classes (DIODE, KITTI) on synthetic
trees, through the jitted tiny pipeline and the full metric dispatch."""

import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from stablemtl_tpu.data import DatasetMode
from stablemtl_tpu.data.datasets import DIODEDataset, KITTIDataset
from stablemtl_tpu.evaluation import Evaluator, make_task_metrics
from stablemtl_tpu.models import AutoencoderKL, UNet2DConditionModel
from stablemtl_tpu.models.unet import tiny_unet_config
from stablemtl_tpu.models.vae import tiny_vae_config
from stablemtl_tpu.pipeline import N_TASKS, StableMTLPipeline, jit_infer


def _make_diode_tree(root):
    """Synthetic DIODE tree (rgb + depth/mask/normal npy). Shared with
    test_eval_datasets.py's all-rows Evaluator run."""
    h, w = 32, 32
    rng = np.random.default_rng(0)
    lines = []
    os.makedirs(root / "scans", exist_ok=True)
    for i in range(2):
        Image.fromarray((rng.random((h, w, 3)) * 255).astype(np.uint8)) \
            .save(root / f"scans/{i:05d}.png")
        np.save(root / f"scans/{i:05d}_depth.npy",
                rng.uniform(1, 20, (h, w, 1)).astype(np.float32))
        np.save(root / f"scans/{i:05d}_depth_mask.npy", np.ones((h, w), bool))
        n = rng.standard_normal((h, w, 3)).astype(np.float32)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        np.save(root / f"scans/{i:05d}_normal.npy", n)
        lines.append(f"scans/{i:05d}.png scans/{i:05d}_depth.npy "
                     f"scans/{i:05d}_depth_mask.npy")
    for name in ("val.txt", "split.txt"):
        with open(root / name, "w") as f:
            f.write("\n".join(lines))
    return root


def _make_kitti_tree(root):
    """Synthetic KITTI eigen-test tree (sparse uint16 depth png)."""
    h, w = 370, 1230
    rng = np.random.default_rng(0)
    os.makedirs(root / "img", exist_ok=True)
    os.makedirs(root / "gt", exist_ok=True)
    Image.fromarray((rng.random((h, w, 3)) * 255).astype(np.uint8)) \
        .save(root / "img/0.png")
    depth = np.zeros((h, w), np.uint16)
    depth[200:300, 300:900] = (rng.uniform(5, 60, (100, 600)) * 256) \
        .astype(np.uint16)  # sparse lidar-style
    cv2.imwrite(str(root / "gt/0.png"), depth)
    with open(root / "split.txt", "w") as f:
        f.write("img/0.png gt/0.png\nimg/0.png None\n")
    return root


@pytest.fixture(scope="module")
def diode_tree(tmp_path_factory):
    return _make_diode_tree(tmp_path_factory.mktemp("diode"))


def _tiny_pipe():
    k = jax.random.split(jax.random.PRNGKey(0), 3)
    vae = AutoencoderKL(tiny_vae_config())
    vp = vae.init(k[0], jnp.zeros((1, 32, 32, 3)))
    unet = UNet2DConditionModel(tiny_unet_config(cross_attention_dim=32))
    up = unet.init(k[1], jnp.zeros((1, 4, 4, 12)), jnp.zeros((1,), jnp.int32),
                   jnp.zeros((1, 4, 32)))
    return StableMTLPipeline(
        vae=vae, unet=unet, vae_params=vp, unet_params=up,
        text_embed_table=jax.random.normal(k[2], (N_TASKS, 4, 32)) * 0.02)


def test_diode_eval_end_to_end(diode_tree):
    ds = DIODEDataset(mode=DatasetMode.EVAL,
                      filename_ls_path=str(diode_tree / "val.txt"),
                      dataset_dir=str(diode_tree))
    s = ds.get(0)
    assert s["depth_raw_linear"].shape == (32, 32, 1)
    assert s["normal"].shape == (32, 32, 3)
    # DIODE axis convention applied: normals stay unit-length
    np.testing.assert_allclose(
        np.linalg.norm(s["normal"], axis=-1), 1.0, atol=1e-4)

    pipe = _tiny_pipe()
    ev = Evaluator(infer_fn=jit_infer(pipe))
    res = ev.evaluate(ds, tasks=["depth", "normal"],
                      metrics=make_task_metrics())
    # untrained model: metrics exist and are finite, not good
    assert np.isfinite(res["depth"]["abs_relative_difference"])
    assert 0 <= res["depth"]["delta1_acc"] <= 1
    assert 0 <= res["normal"]["mean_angular_error"] <= 180


def test_kitti_eval_crop_and_mask(tmp_path):
    _make_kitti_tree(tmp_path)
    ds = KITTIDataset(mode=DatasetMode.EVAL,
                      filename_ls_path=str(tmp_path / "split.txt"),
                      dataset_dir=str(tmp_path),
                      kitti_bm_crop=True, valid_mask_crop="eigen")
    assert len(ds) == 1  # 'None' depth line filtered (kitti_dataset.py:32)
    s = ds.get(0)
    assert s["rgb_norm"].shape == (352, 1216, 3)  # benchmark crop
    assert s["depth_raw_linear"].shape == (352, 1216, 1)
    # eigen crop zeroes the mask near the top
    assert not s["valid_mask"][:int(0.33 * 352)].any()
    assert s["valid_mask"].sum() > 0
