"""Evaluator end-to-end for every task family: a perfect (GT-derived)
prediction must score (near-)perfectly through alignment + metrics."""

import numpy as np

from stablemtl_tpu.evaluation import Evaluator, make_task_metrics
from stablemtl_tpu.pipeline import TASKS


class _DS:
    min_depth, max_depth = 1e-5, 80.0

    def __init__(self, task, n=2, h=16, w=16):
        self.output_type = task
        self.disp_name = f"fake_{task}"
        self.n, self.h, self.w = n, h, w

    def __len__(self):
        return self.n

    def get(self, idx, rng=None):
        r = np.random.RandomState(idx + 7)
        h, w = self.h, self.w
        img = r.uniform(-1, 1, (h, w, 3)).astype(np.float32)
        s = {"rgb_norm": img, "rgb_next_norm": img,
             "valid_mask": np.ones((h, w, 1), bool),
             "output_type": self.output_type}
        t = self.output_type
        if t == "depth":
            s["depth_raw_linear"] = r.uniform(1, 10, (h, w, 1)) \
                .astype(np.float32)
        elif t == "normal":
            n = r.standard_normal((h, w, 3)).astype(np.float32)
            s["normal"] = n / np.linalg.norm(n, axis=-1, keepdims=True)
            s["normal_valid_mask"] = np.ones((h, w, 1), bool)
        elif t == "semantic":
            s["semantic_class_id"] = r.randint(0, 8, (h, w, 1))
        elif t == "optical_flow":
            s["optical_flow_raw"] = r.uniform(-5, 5, (h, w, 2)) \
                .astype(np.float32)
        elif t == "scene_flow":
            s["scene_flow"] = r.uniform(-2, 2, (h, w, 3)).astype(np.float32)
            s["scene_flow_valid_mask"] = np.ones((h, w, 1), bool)
        elif t in ("albedo", "shading"):
            c = 3 if t == "albedo" else 1
            s[t] = r.uniform(0.2, 0.8, (h, w, c)).astype(np.float32)
            s[f"{t}_valid_mask"] = np.ones((h, w, 1), bool)
        return s


def _perfect_infer_for(ds, class_colors):
    """3ch [-1,1] prediction that postprocesses exactly to the GT."""

    def infer(rgb, rgb_next, task_idx):
        idx = infer.calls % len(ds)
        infer.calls += 1
        s = ds.get(idx)
        t = ds.output_type
        if t == "depth":
            d = s["depth_raw_linear"]
            x = (d - d.min()) / (d.max() - d.min()) * 2 - 1  # affine ok
            out = np.repeat(x, 3, -1)
        elif t == "normal":
            out = s["normal"]
        elif t == "semantic":
            out = class_colors[s["semantic_class_id"][..., 0]] \
                / 255.0 * 2 - 1
        elif t == "optical_flow":
            f = s["optical_flow_raw"]
            x = f / np.abs(f).max(axis=(0, 1))  # per-channel scale ok (NNLS)
            out = np.concatenate([x, x[..., :1]], -1)
        elif t == "scene_flow":
            f = s["scene_flow"]
            out = f / np.abs(f).max(axis=(0, 1))
        elif t == "albedo":
            out = s["albedo"] * 0.5 * 2 - 1  # scale matched by metric
        else:  # shading
            out = np.repeat(s["shading"] * 2 - 1, 3, -1)
        return out[None].astype(np.float32)

    infer.calls = 0
    return infer


def test_all_tasks_perfect_scores():
    from stablemtl_tpu.factory import class_colors

    colors = class_colors()
    for task in TASKS:
        ds = _DS(task)
        ev = Evaluator(infer_fn=_perfect_infer_for(ds, colors),
                       class_colors=colors)
        res = ev.evaluate(ds, tasks=[task], metrics=make_task_metrics())[task]
        if task == "depth":
            assert res["abs_relative_difference"] < 1e-4, res
        elif task == "normal":
            assert res["mean_angular_error"] < 0.1, res
        elif task == "semantic":
            assert res["mIoU"] > 0.999, res
        elif task == "optical_flow":
            assert res["EPE2d"] < 1e-3, res
        elif task == "scene_flow":
            assert res["EPE3d"] < 1e-3 and res["acc_strict"] > 0.999, res
        else:
            assert res["rmse"] < 1e-6 and res["ssim"] > 0.999, res
