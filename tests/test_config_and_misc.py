import os

import numpy as np
import pytest

from stablemtl_tpu.config import Config, merge_dicts, recursive_load_config
from stablemtl_tpu.utils.schedules import IterExponential, iter_exponential_ratio
from stablemtl_tpu.utils.seeding import generate_seed_sequence, step_key, step_rng
from stablemtl_tpu.data.semantic import VKitti2Encoder, CityscapesEncoder, IGNORE_INDEX


def test_merge_dicts_override_and_recurse():
    base = {"a": 1, "b": {"x": 1, "y": 2}}
    over = {"b": {"y": 3, "z": 4}, "c": 5}
    out = merge_dicts(base, over)
    assert out == {"a": 1, "b": {"x": 1, "y": 3, "z": 4}, "c": 5}


def test_recursive_config_loading(tmp_path):
    (tmp_path / "base.yaml").write_text("lr: 1.0e-4\ntrainer:\n  save_period: 500\n")
    (tmp_path / "mid.yaml").write_text(
        "base_config:\n- base.yaml\ntrainer:\n  save_period: 100\n  extra: 1\n")
    (tmp_path / "top.yaml").write_text(
        "base_config:\n- mid.yaml\nlr: 2.0e-4\n")
    cfg = recursive_load_config(str(tmp_path / "top.yaml"), root=str(tmp_path))
    assert cfg.lr == 2.0e-4
    assert cfg.trainer.save_period == 100
    assert cfg.trainer.extra == 1


def test_config_attr_access():
    cfg = Config({"a": {"b": 2}})
    assert cfg.a.b == 2
    assert cfg.get("missing", 7) == 7
    with pytest.raises(AttributeError):
        _ = cfg.nope


def test_iter_exponential_parity_host_vs_jax():
    sched = IterExponential(total_iter_length=1000, final_ratio=0.01, warmup_steps=100)
    for n in [0, 1, 50, 99, 100, 101, 500, 999, 1000, 5000]:
        host = sched(n)
        dev = float(iter_exponential_ratio(n, 1000, 0.01, 100))
        assert host == pytest.approx(dev, rel=1e-4), n  # f32 on device
    assert sched(0) == 0.0
    assert sched(100) == pytest.approx(1.0)
    assert sched(1000) == 0.01


def test_seed_sequence_deterministic():
    a = generate_seed_sequence(2024, 10)
    b = generate_seed_sequence(2024, 10)
    assert a == b
    assert generate_seed_sequence(1, 10) != a


def test_step_key_and_rng_deterministic():
    import jax.numpy as jnp
    k1 = step_key(0, 5)
    k2 = step_key(0, 5)
    assert (jnp.asarray(k1) == jnp.asarray(k2)).all()
    r1 = step_rng(0, 5).integers(0, 1 << 30, 4)
    r2 = step_rng(0, 5).integers(0, 1 << 30, 4)
    np.testing.assert_array_equal(r1, r2)
    r3 = step_rng(0, 6).integers(0, 1 << 30, 4)
    assert (r1 != r3).any()


def test_vkitti_encoder_roundtrip():
    enc = VKitti2Encoder(n_classes=8)
    # dense ids
    ids = np.array([[5, 4, 1], [12, 0, 9]])  # road, building, sky / car, terrain, pole
    lbl = enc.encode_segmap(ids)
    assert lbl[0, 0] == 0 and lbl[0, 1] == 1 and lbl[0, 2] == 6
    assert lbl[1, 0] == 7 and lbl[1, 1] == IGNORE_INDEX and lbl[1, 2] == 2
    # rgb decoding: VKITTI2 road color (100,60,100)
    rgb = np.zeros((2, 2, 3), dtype=np.uint8)
    rgb[:] = (100, 60, 100)
    lbl2 = enc.encode_segmap(rgb)
    assert (lbl2 == 0).all()


def test_encoder_color_roundtrip_through_palette():
    enc = VKitti2Encoder(n_classes=8)
    ids = np.arange(8).reshape(2, 4)
    color = enc.segmap2color(ids)  # [2,4,3] in 0..255
    img = color / 255.0 * 2.0 - 1.0
    back = enc.color2class_id(img)
    np.testing.assert_array_equal(back, ids)


def test_cityscapes_encoder_shares_palette():
    cs = CityscapesEncoder(n_classes=8)
    vk = VKitti2Encoder(n_classes=8)
    np.testing.assert_array_equal(cs.class_color_embeddings, vk.class_color_embeddings)


def test_multi_res_noise_like():
    import jax
    import jax.numpy as jnp
    from stablemtl_tpu.utils.image_util import multi_res_noise_like

    x = jnp.zeros((2, 16, 16, 4))
    k = jax.random.PRNGKey(0)
    n1 = multi_res_noise_like(k, x, strength=0.9)
    n2 = multi_res_noise_like(k, x, strength=0.9)
    assert n1.shape == x.shape
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    # unit variance after the pyramid accumulation (doc contract)
    assert abs(float(jnp.std(n1)) - 1.0) < 0.15
    # strength=0 keeps only the base white noise octave... pyramid off
    base = multi_res_noise_like(k, x, strength=0.0)
    assert np.isfinite(np.asarray(base)).all()
    import pytest as _pytest
    with _pytest.raises(ValueError):
        multi_res_noise_like(k, x, downscale_strategy="nope")


def test_import_data_splits_tool(tmp_path, monkeypatch):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "import_data_splits",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools", "import_data_splits.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    ref = tmp_path / "ref"
    (ref / "data_split" / "vkitti").mkdir(parents=True)
    (ref / "data_split" / "vkitti" / "vkitti_depth_train.txt").write_text(
        "a\nb\n")
    (ref / "data_split" / "readme.md").write_text("not copied")
    out = tmp_path / "out"
    monkeypatch.setattr("sys.argv", ["x", "--reference", str(ref),
                                     "--out", str(out)])
    mod.main()
    assert (out / "vkitti" / "vkitti_depth_train.txt").read_text() == "a\nb\n"
    assert not (out / "readme.md").exists()  # only .txt lists are imported


def test_step_timer_ema():
    import time as _time
    from stablemtl_tpu.utils.profiling import StepTimer, annotate

    t = StepTimer(ema=0.5)
    with t:
        _time.sleep(0.01)
    first = t.value
    assert first is not None and first >= 0.01
    with t:
        pass
    assert t.value < first  # EMA moved toward the fast step
    with annotate("test-region"):
        pass


def test_resolve_config_arg(tmp_path):
    """--config accepts a yaml OR a training run dir (archived
    config_resolved.json + implied checkpoint/), reference
    eval_mtl.py:180-194."""
    import json

    from stablemtl_tpu.config import resolve_config_arg

    y = tmp_path / "c.yaml"
    y.write_text("model:\n  size_preset: tiny\n")
    cfg, ck = resolve_config_arg(str(y))
    assert cfg.model.size_preset == "tiny" and ck is None

    run = tmp_path / "run"
    (run / "checkpoint").mkdir(parents=True)
    (run / "config_resolved.json").write_text(
        json.dumps({"model": {"size_preset": "full"}}))
    cfg, ck = resolve_config_arg(str(run))
    assert cfg.model.size_preset == "full"
    assert ck == str(run / "checkpoint")

    with pytest.raises(SystemExit, match="config_resolved.json"):
        resolve_config_arg(str(tmp_path))
