import numpy as np
import pytest
import torch

from stablemtl_tpu.utils.normalizers import (
    ScaleShiftDepthNormalizer,
    ScaleShiftOpticalFlowNormalizer,
    normalize_optical_flow,
    normalize_scene_flow,
)


def _torch_depth_norm(depth, valid_mask, q=0.02, clip=True):
    """Direct transliteration of reference depth_transform.py:79-96."""
    d = torch.from_numpy(depth)
    m = torch.from_numpy(valid_mask) & (d > 0)
    lo, hi = torch.quantile(d[m].double(), torch.tensor([q, 1 - q]).double())
    out = (d - lo) / (hi - lo) * 2.0 + (-1.0)
    if clip:
        out = torch.clip(out, -1.0, 1.0)
    return out.numpy()


def test_depth_normalizer_matches_torch_reference_formula():
    rng = np.random.default_rng(0)
    depth = rng.uniform(0.1, 80.0, size=(64, 48)).astype(np.float32)
    mask = rng.uniform(size=depth.shape) > 0.2
    norm = ScaleShiftDepthNormalizer()
    out = norm(depth, mask)
    ref = _torch_depth_norm(depth, mask)
    np.testing.assert_allclose(out, ref, atol=1e-5)
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_depth_normalizer_maps_quantiles_to_range():
    depth = np.linspace(1, 100, 10000).reshape(100, 100)
    norm = ScaleShiftDepthNormalizer(min_max_quantile=0.02)
    out = norm(depth)
    lo, hi = np.quantile(depth, [0.02, 0.98])
    # values at the quantile points map to -1 / +1
    assert out[np.abs(depth - lo).argmin() // 100, np.abs(depth - lo).argmin() % 100] == pytest.approx(-1.0, abs=1e-2)
    assert out.max() == pytest.approx(1.0)


def test_flow_normalizer_sign_preserving():
    rng = np.random.default_rng(1)
    flow = rng.normal(scale=[5.0, 0.5], size=(32, 32, 2)).transpose(2, 0, 1).astype(np.float32)
    norm = ScaleShiftOpticalFlowNormalizer()
    out = norm(flow)
    assert out.min() >= -1.0 and out.max() <= 1.0
    # max-abs per-channel divide preserves zero and sign
    np.testing.assert_array_equal(np.sign(out), np.sign(flow))
    for c in range(2):
        m = max(abs(flow[c].max()), abs(flow[c].min()))
        np.testing.assert_allclose(out[c], np.clip(flow[c] / m, -1, 1), rtol=1e-6)


def test_normalize_optical_flow_hw_and_norm():
    flow = np.stack([np.full((4, 4), 2.0), np.full((4, 4), -8.0)])
    out = normalize_optical_flow(flow, "hw")
    np.testing.assert_allclose(out[0], 1.0)
    np.testing.assert_allclose(out[1], -1.0)
    out2 = normalize_optical_flow(flow, "norm")
    mag = np.sqrt(2.0 ** 2 + 8.0 ** 2)
    np.testing.assert_allclose(out2[0], 2.0 / mag)


def test_normalize_scene_flow_zero_channel_untouched():
    sf = np.stack([np.zeros((4, 4)), np.ones((4, 4)), -2 * np.ones((4, 4))])
    out = normalize_scene_flow(sf, "hw")
    np.testing.assert_allclose(out[0], 0.0)
    np.testing.assert_allclose(out[1], 1.0)
    np.testing.assert_allclose(out[2], -1.0)
