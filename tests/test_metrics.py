import numpy as np
import pytest

from stablemtl_tpu.utils.metrics import (
    AlbedoAndShadingMetrics,
    MetricTracker,
    OpticalFlowMetrics,
    SceneFlowMetrics,
    SemanticMetrics,
    depth_metrics,
    normal_metrics,
    match_scale,
    ssim,
)


def test_metric_tracker():
    t = MetricTracker("a", "b")
    t.update("a", 1.0)
    t.update("a", 3.0)
    t.update("b", 2.0, n=2)
    assert t.avg("a") == 2.0
    assert t.result() == {"a": 2.0, "b": 2.0}
    t.reset()
    assert t.result()["a"] == 0.0


def test_depth_metrics_perfect_prediction():
    gt = np.random.default_rng(0).uniform(1, 10, size=(1, 16, 16))
    mask = np.ones_like(gt, dtype=bool)
    assert depth_metrics.abs_relative_difference(gt, gt, mask) == 0.0
    assert depth_metrics.rmse_linear(gt, gt, mask) == 0.0
    assert depth_metrics.delta1_acc(gt, gt, mask) == 1.0
    assert depth_metrics.silog_rmse(gt, gt, mask) == 0.0


def test_depth_absrel_known_value():
    gt = np.full((1, 4, 4), 2.0)
    pred = np.full((1, 4, 4), 3.0)
    mask = np.ones_like(gt, dtype=bool)
    assert depth_metrics.abs_relative_difference(pred, gt, mask) == pytest.approx(0.5)
    assert depth_metrics.squared_relative_difference(pred, gt, mask) == pytest.approx(0.5)
    assert depth_metrics.rmse_linear(pred, gt, mask) == pytest.approx(1.0)
    # ratio 1.5 > 1.25 -> delta1 = 0; < 1.5625 -> delta2 = 1
    assert depth_metrics.delta1_acc(pred, gt, mask) == 0.0
    assert depth_metrics.delta2_acc(pred, gt, mask) == 1.0


def test_depth_metrics_respect_mask():
    gt = np.full((1, 4, 4), 2.0)
    pred = gt.copy()
    pred[0, 0, 0] = 100.0  # broken pixel, masked out
    mask = np.ones_like(gt, dtype=bool)
    mask[0, 0, 0] = False
    assert depth_metrics.abs_relative_difference(pred, gt, mask) == 0.0


def test_normal_mean_angular_error():
    # 90-degree rotation about z between pred and gt
    gt = np.zeros((1, 3, 8, 8))
    gt[:, 0] = 1.0
    pred = np.zeros((1, 3, 8, 8))
    pred[:, 1] = 1.0
    mask = np.ones((1, 1, 8, 8))
    assert normal_metrics.mean_angular_error(pred, gt, mask) == pytest.approx(90.0)
    assert normal_metrics.mean_angular_error(gt, gt, mask) == pytest.approx(0.0)


def test_semantic_miou():
    m = SemanticMetrics(n_classes=3)
    gt = np.array([[[0, 0, 1, 1, 2, 2]]])
    pred = np.array([[[0, 0, 1, 2, 2, 2]]])
    mask = np.ones_like(gt, dtype=bool)
    m.update(gt, pred, mask)
    r = m.result()
    # class0: IoU 2/2=1; class1: inter 1, union 2 -> .5; class2: inter 2, union 3
    assert r["cls_00"] == pytest.approx(1.0)
    assert r["cls_01"] == pytest.approx(0.5)
    assert r["cls_02"] == pytest.approx(2 / 3)
    assert r["mIoU"] == pytest.approx((1.0 + 0.5 + 2 / 3) / 3)
    assert r["Acc"] == pytest.approx(5 / 6)


def test_optical_flow_metrics():
    gt = np.zeros((1, 2, 8, 8))
    gt[:, 0] = 10.0
    pred = gt.copy()
    pred[:, 0, 0, 0] = 20.0  # epe 10 at one pixel -> Fl outlier there
    mask = np.ones((1, 1, 8, 8))
    m = OpticalFlowMetrics()
    m.update(pred, gt, mask)
    r = m.result()
    assert r["EPE2d"] == pytest.approx(10.0 / 64)
    assert r["Fl"] == pytest.approx(1 / 64)
    assert r["optical_flow_MAE"] == pytest.approx(0.0, abs=1e-4)


def test_scene_flow_metrics_perfect():
    gt = np.random.default_rng(0).normal(size=(1, 3, 8, 8))
    mask = np.ones((1, 1, 8, 8))
    m = SceneFlowMetrics()
    m.update(gt, gt, mask)
    r = m.result()
    assert r["EPE3d"] == 0.0
    assert r["acc_strict"] == 1.0
    assert r["outliers"] == 0.0


def test_match_scale():
    rng = np.random.default_rng(0)
    gt = rng.uniform(0.1, 1.0, size=(16, 16, 3))
    pred = gt / 3.0
    scale = match_scale(pred, gt)
    assert float(scale) == pytest.approx(3.0, rel=1e-6)


def test_ssim_identical_is_one():
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(32, 32, 3))
    assert ssim(x, x, data_range=1.0, channel_axis=2) == pytest.approx(1.0)


def test_ssim_decreases_with_noise():
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(32, 32))
    y = np.clip(x + rng.normal(scale=0.2, size=x.shape), 0, 1)
    v = ssim(x, y, data_range=1.0)
    assert 0.0 < v < 0.9


def test_ssim_known_constant_shift():
    # constant images: variance terms vanish; closed form
    x = np.full((16, 16), 0.5)
    y = np.full((16, 16), 0.6)
    C1 = (0.01 * 1.0) ** 2
    expected = (2 * 0.5 * 0.6 + C1) / (0.5 ** 2 + 0.6 ** 2 + C1)
    assert ssim(x, y, data_range=1.0) == pytest.approx(expected, rel=1e-6)


def test_albedo_shading_metrics_scaled_prediction_is_perfect():
    rng = np.random.default_rng(0)
    gt = rng.uniform(0.2, 0.8, size=(1, 3, 32, 32))
    pred = gt * 0.5  # recoverable by scale matching
    mask = np.ones((1, 1, 32, 32))
    m = AlbedoAndShadingMetrics()
    m.update(pred, gt, mask)
    r = m.result()
    assert r["rmse"] == pytest.approx(0.0, abs=1e-7)
    assert r["ssim"] == pytest.approx(1.0, abs=1e-7)
    assert r["lmse"] == pytest.approx(0.0, abs=1e-10)
