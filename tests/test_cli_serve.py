"""Serve CLI drive: offline batch over a tiny scratch model + AOT export."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def serve_config(tmp_path_factory):
    d = tmp_path_factory.mktemp("serve_cfg")
    cfg = d / "serve_tiny.yaml"
    cfg.write_text(
        "model:\n"
        "  size_preset: tiny\n"
        "  pretrained_path: scratch\n"
        "trainer:\n"
        "  multi_stream: true\n"
        "pipeline:\n"
        "  decode_chunk: 0\n"
    )
    return cfg


def test_serve_cli_batch_and_export(serve_config, tmp_path, capsys):
    import cv2

    from stablemtl_tpu.cli.serve import main as serve_main
    from stablemtl_tpu.pipeline import TASKS

    imgs = []
    rng = np.random.RandomState(0)
    for i in range(3):
        p = tmp_path / f"img{i}.png"
        cv2.imwrite(str(p), rng.randint(0, 255, (16, 16, 3), np.uint8))
        imgs.append(str(p))

    out = tmp_path / "served"
    serve_main(["--config", str(serve_config), "--images", *imgs,
                "--output_dir", str(out), "--res", "16", "--batch", "2",
                "--max_delay_ms", "50", "--save_npz"])
    for i in range(3):
        for task in TASKS:
            assert (out / f"img{i}_{task}.png").exists(), (i, task)
        raw = np.load(out / f"img{i}.npz")
        assert set(raw.files) == set(TASKS)
        assert raw["depth"].shape == (16, 16, 1)  # keepdims channel rule
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["served"] == 3

    # export mode: artifact written, no images needed
    art = tmp_path / "all_tasks.stablehlo"
    serve_main(["--config", str(serve_config), "--export", str(art),
                "--res", "16", "--batch", "2"])
    assert art.exists() and art.stat().st_size > 0
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["bytes"] == art.stat().st_size
