"""Tests for offline preprocessing ports and visualization utilities."""

import numpy as np
import pytest

from stablemtl_tpu.preprocess.depth_to_normal import depth_to_normal
from stablemtl_tpu.preprocess.flyingthings3d import (
    disp2pc,
    preprocess_ft3d_sample,
)
from stablemtl_tpu.preprocess.hypersim import (
    dist_to_depth,
    shading_from,
    tone_map_hdr,
    tonemap_scale,
)
from stablemtl_tpu.utils.visualizer import (
    colorize_depth,
    flow_to_image,
    make_colorwheel,
    map_class_to_color,
    tone_map,
    visualize_normal,
    visualize_scene_flow,
)
from stablemtl_tpu.utils.image_util import resize_max_res


def test_tone_map_percentile_rule():
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0, 4.0, (32, 32, 3))
    out = tone_map_hdr(rgb)
    assert out.min() >= 0 and out.max() <= 1
    # the 90th-percentile brightness of the output should be ~0.8
    b = 0.3 * out[..., 0] + 0.59 * out[..., 1] + 0.11 * out[..., 2]
    assert abs(np.percentile(b, 90) - 0.8) < 0.05
    # all-dark image -> scale 0
    assert tonemap_scale(np.zeros((8, 8, 3))) == 0.0


def test_dist_to_depth_center_identity():
    # at the image center the ray is ~parallel to the axis: depth ~= dist
    dist = np.full((768, 1024), 10.0)
    depth = dist_to_depth(dist)
    assert abs(depth[384, 512] - 10.0) < 1e-3
    # at corners the planar depth is smaller than the ray distance
    assert depth[0, 0] < 10.0


def test_shading_inverse():
    rng = np.random.default_rng(1)
    albedo = rng.uniform(0.2, 1.0, (8, 8, 3))
    shading = rng.uniform(0.1, 1.0, (8, 8, 3))
    rgb = albedo * shading
    np.testing.assert_allclose(shading_from(rgb, albedo), shading, rtol=1e-5)


def test_disp2pc_depth_axis():
    disp = np.full((8, 8), 2.0)
    pc = disp2pc(disp)
    np.testing.assert_allclose(pc[..., 2], 1050.0 / 2.0, rtol=1e-4)


def test_preprocess_ft3d_sample():
    h, w = 16, 16
    disp1 = np.full((h, w), 50.0)
    change = np.full((h, w), 1.0)
    flow = np.zeros((h, w, 2), np.float32)
    flow[0, 0] = [600.0, 0.0]  # exceeds 500px clamp
    pc1, flow3d, flow2d, mask = preprocess_ft3d_sample(disp1, change, flow)
    assert pc1.shape[1] == 3 and flow3d.shape[1] == 3
    assert not mask[0, 0] and mask[1, 1]
    assert (flow2d[0, 0] == 0).all()
    # pure disparity change with zero flow -> flow purely along -z
    assert abs(flow3d[:, 2].mean() - (1050.0 / 51 - 1050.0 / 50)) < 1e-3


def test_depth_to_normal_plane():
    # fronto-parallel constant depth -> normal = (0, 0, 1) toward camera
    depth = np.full((32, 64), 5.0)
    n = depth_to_normal(depth, fx=700, fy=700, u0=32, v0=16,
                        version="d2nt_basic")
    inner = n[4:-4, 4:-4]
    np.testing.assert_allclose(np.abs(inner[..., 2]), 1.0, atol=1e-5)
    np.testing.assert_allclose(inner[..., 0], 0.0, atol=1e-5)
    n3 = depth_to_normal(depth, fx=700, fy=700, u0=32, v0=16,
                         version="d2nt_v3")
    assert n3.shape == (32, 64, 3)
    np.testing.assert_allclose(
        np.linalg.norm(n3[4:-4, 4:-4], axis=-1), 1.0, atol=1e-5)


def test_visualizer_shapes():
    assert make_colorwheel().shape == (55, 3)
    flow = np.random.default_rng(0).normal(size=(16, 16, 2)).astype(np.float32)
    img = flow_to_image(flow)
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8

    depth = np.random.default_rng(1).uniform(1, 10, (16, 16))
    d = colorize_depth(depth)
    assert d.shape == (16, 16, 3) and d.dtype == np.uint8

    sf = np.random.default_rng(2).normal(size=(16, 16, 3)).astype(np.float32)
    assert visualize_scene_flow(sf).shape == (16, 16, 3)

    colors = np.array([[255, 0, 0], [0, 255, 0]], np.float32)
    cid = np.array([[0, 1], [250, 0]])
    out = map_class_to_color(cid, colors)
    np.testing.assert_array_equal(out[0, 0], [255, 0, 0])
    np.testing.assert_array_equal(out[1, 0], [0, 0, 0])  # ignore -> black

    normal = np.zeros((4, 4, 3), np.float32)
    normal[..., 2] = 1.0
    nv = visualize_normal(normal)
    np.testing.assert_array_equal(nv[0, 0], [127, 127, 255])

    tm = tone_map(np.random.default_rng(3).uniform(0, 3, (8, 8)))
    assert tm.max() <= 1.0


def test_resize_max_res():
    img = np.zeros((100, 200, 3), np.uint8)
    out = resize_max_res(img, 100)
    assert out.shape == (50, 100, 3)
