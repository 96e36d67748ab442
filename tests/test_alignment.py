import numpy as np
import pytest
from scipy.optimize import nnls

from stablemtl_tpu.utils.alignment import (
    _nnls_scale_1d,
    align_depth_least_square,
    align_flow_least_square,
    align_flow_norm_least_square,
    depth2disparity,
)


def test_nnls_closed_form_matches_scipy():
    rng = np.random.default_rng(0)
    for _ in range(20):
        p = rng.normal(size=200)
        g = rng.normal(size=200)
        x_scipy, _ = nnls(p.reshape(-1, 1), g)
        assert _nnls_scale_1d(p, g) == pytest.approx(x_scipy[0], abs=1e-10)


def test_nnls_clamps_negative():
    p = np.ones(10)
    g = -np.ones(10)
    assert _nnls_scale_1d(p, g) == 0.0


def test_align_depth_recovers_affine():
    rng = np.random.default_rng(1)
    gt = rng.uniform(1, 10, size=(1, 32, 40))
    pred = (gt - 3.0) / 2.5  # gt = 2.5*pred + 3
    mask = rng.uniform(size=gt.shape) > 0.3
    aligned, scale, shift = align_depth_least_square(gt, pred, mask)
    assert scale == pytest.approx(2.5, rel=1e-6)
    assert shift == pytest.approx(3.0, rel=1e-6)
    np.testing.assert_allclose(aligned, gt, rtol=1e-6)


def test_align_flow_per_channel_scale():
    rng = np.random.default_rng(2)
    gt = rng.normal(size=(2, 16, 20))
    pred = gt / np.array([2.0, 4.0])[:, None, None]
    mask = np.ones((16, 20), dtype=bool)
    aligned, scale, shift = align_flow_least_square(gt, pred, mask)
    np.testing.assert_allclose(scale, [2.0, 4.0], rtol=1e-6)
    np.testing.assert_allclose(aligned, gt, rtol=1e-6)
    np.testing.assert_allclose(shift, 0.0)


def test_align_flow_matches_scipy_nnls_per_channel():
    rng = np.random.default_rng(3)
    gt = rng.normal(size=(3, 8, 9))
    pred = rng.normal(size=(3, 8, 9))
    mask = rng.uniform(size=(8, 9)) > 0.4
    _, scale, _ = align_flow_least_square(gt, pred, mask)
    for c in range(3):
        x, _ = nnls(pred[c][mask].reshape(-1, 1), gt[c][mask].reshape(-1))
        assert scale[c] == pytest.approx(x[0], abs=1e-10)


def test_align_flow_norm():
    rng = np.random.default_rng(4)
    gt = rng.normal(size=(2, 10, 10))
    pred = gt * 0.25
    mask = np.ones((10, 10), dtype=bool)
    aligned, scale, _ = align_flow_norm_least_square(gt, pred, mask)
    assert scale == pytest.approx(4.0, rel=1e-6)
    np.testing.assert_allclose(aligned, gt, rtol=1e-5)


def test_depth2disparity_roundtrip():
    d = np.array([0.0, 2.0, 4.0])
    disp = depth2disparity(d)
    np.testing.assert_allclose(disp, [0.0, 0.5, 0.25])
