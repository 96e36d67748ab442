"""User-facing prediction API — the reference pipeline __call__ equivalent.

Mirrors /root/reference/src/stablemtl_pipeline.py:177-368: accepts a uint8
(or [-1,1] float) image, optionally resizes the longer edge to
`processing_res`, runs single-step inference for the requested task,
resizes back to the input resolution, and returns a task-space numpy
output plus a ready-to-save visualization.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import cv2
import numpy as np

from .evaluation import postprocess_prediction
from .pipeline import StableMTLPipeline, TASK_INDEX, jit_infer
from .utils.image_util import resize_max_res
from .utils.visualizer import (
    colorize_depth,
    map_class_to_color,
    visualize_normal,
    visualize_optical_flow,
    visualize_scene_flow,
)


@dataclasses.dataclass
class Prediction:
    task: str
    output: np.ndarray          # task-space map (see postprocess_prediction)
    visualization: np.ndarray   # uint8 HWC image


class Predictor:
    """Holds the jitted inference executable; re-used across calls so each
    distinct input geometry compiles once."""

    def __init__(self, pipeline: StableMTLPipeline,
                 class_colors: Optional[np.ndarray] = None,
                 processing_res: int = 0):
        self.pipeline = pipeline
        self.class_colors = class_colors
        self.processing_res = processing_res
        self._infer = jit_infer(pipeline)
        self._infer_all = None  # built lazily on first all_tasks() call

    def __call__(self, image: np.ndarray, task: str,
                 next_image: Optional[np.ndarray] = None,
                 match_input_res: bool = True) -> Prediction:
        rgb = _to_norm(image)
        rgb_next = _to_norm(next_image) if next_image is not None else None
        in_hw = rgb.shape[:2]
        if self.processing_res > 0:
            rgb = resize_max_res(rgb, self.processing_res)
            if rgb_next is not None:
                rgb_next = resize_max_res(rgb_next, self.processing_res)

        # rgb_next=None takes the pipeline's single-frame path (one VAE
        # encode instead of two)
        pred3 = np.asarray(self._infer(
            rgb[None], None if rgb_next is None else rgb_next[None],
            np.asarray(TASK_INDEX[task], np.int32)))[0]
        if match_input_res and pred3.shape[:2] != in_hw:
            pred3 = cv2.resize(pred3, (in_hw[1], in_hw[0]),
                               interpolation=cv2.INTER_LINEAR)
        out = postprocess_prediction(task, pred3, self.class_colors)
        return Prediction(task=task, output=out,
                          visualization=_visualize(task, out,
                                                   self.class_colors))

    def all_tasks(self, image: np.ndarray,
                  next_image: Optional[np.ndarray] = None,
                  match_input_res: bool = True) -> dict:
        """All 7 tasks from one fused forward (VAE encode, child taps and
        cross-task K/V computed once — pipeline.infer_all_tasks); the
        reference runs its full pipeline once per task. Returns
        {task: Prediction}."""
        from .pipeline import TASKS, jit_infer_all_tasks

        if self._infer_all is None:
            self._infer_all = jit_infer_all_tasks(self.pipeline)
        rgb = _to_norm(image)
        rgb_next = _to_norm(next_image) if next_image is not None else None
        in_hw = rgb.shape[:2]
        if self.processing_res > 0:
            rgb = resize_max_res(rgb, self.processing_res)
            if rgb_next is not None:
                rgb_next = resize_max_res(rgb_next, self.processing_res)
        preds = np.asarray(self._infer_all(
            rgb[None], None if rgb_next is None else rgb_next[None]))
        results = {}
        for ti, task in enumerate(TASKS):
            pred3 = preds[ti, 0]
            if match_input_res and pred3.shape[:2] != in_hw:
                pred3 = cv2.resize(pred3, (in_hw[1], in_hw[0]),
                                   interpolation=cv2.INTER_LINEAR)
            out = postprocess_prediction(task, pred3, self.class_colors)
            results[task] = Prediction(
                task=task, output=out,
                visualization=_visualize(task, out, self.class_colors))
        return results


def _to_norm(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img.astype(np.float32) / 255.0 * 2.0 - 1.0
    assert img.min() >= -1.0 - 1e-6 and img.max() <= 1.0 + 1e-6, \
        "float input must be in [-1, 1]"
    return img.astype(np.float32)


def _visualize(task: str, out: np.ndarray, class_colors) -> np.ndarray:
    if task in ("depth", "shading"):
        return colorize_depth(out)
    if task == "albedo":
        return (np.clip(out, 0, 1) * 255).astype(np.uint8)
    if task == "normal":
        return visualize_normal(out)
    if task == "optical_flow":
        return visualize_optical_flow(out)
    if task == "scene_flow":
        return visualize_scene_flow(out)
    if task == "semantic":
        return map_class_to_color(out, class_colors)
    raise ValueError(task)
