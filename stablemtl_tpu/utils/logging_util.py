"""Logging: console+file setup, TensorBoard writer, eval-table dump.

Rebuild of reference src/util/logging_util.py:11-112 (python logging config,
`tb_logger` TensorBoard singleton, `eval_dic_to_text` tabulate+CSV dump).
TensorBoard events are written via tf.summary (tensorflow is host-side only;
nothing here touches the device path).
"""

from __future__ import annotations

import csv
import io
import logging
import os
from typing import Dict, Optional

FORMAT = (" %(asctime)s - %(levelname)s -%(filename)s - %(funcName)s "
          ">> %(message)s")


def setup_logging(filename: Optional[str] = None,
                  console_level: int = logging.INFO,
                  file_level: int = logging.INFO) -> None:
    root = logging.getLogger()
    root.setLevel(min(console_level, file_level))
    # third-party DEBUG spam (jax cache keys etc.) stays out of our logs
    for noisy in ("jax", "jax._src", "orbax", "absl"):
        logging.getLogger(noisy).setLevel(logging.WARNING)
    root.handlers = [h for h in root.handlers
                     if not isinstance(h, (logging.StreamHandler,
                                           logging.FileHandler))]
    sh = logging.StreamHandler()
    sh.setLevel(console_level)
    sh.setFormatter(logging.Formatter(FORMAT))
    root.addHandler(sh)
    if filename:
        os.makedirs(os.path.dirname(os.path.abspath(filename)),
                    exist_ok=True)
        fh = logging.FileHandler(filename)
        fh.setLevel(file_level)
        fh.setFormatter(logging.Formatter(FORMAT))
        root.addHandler(fh)


class TensorBoardWriter:
    """Callable scalar writer: writer(step, {tag: value})."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        self._writer = None

    def _ensure(self):
        if self._writer is None:
            import tensorflow as tf

            os.makedirs(self.log_dir, exist_ok=True)
            self._writer = tf.summary.create_file_writer(self.log_dir)
        return self._writer

    def __call__(self, step: int, scalars: Dict[str, float]):
        try:
            import tensorflow as tf

            with self._ensure().as_default():
                for tag, val in scalars.items():
                    try:
                        tf.summary.scalar(tag, float(val), step=step)
                    except (TypeError, ValueError):
                        pass
                self._writer.flush()
        except ImportError:
            pass

    def write_images(self, step: int, images: Dict[str, "np.ndarray"]):
        """images: {tag: uint8 [H,W,3]} -> TB image summaries."""
        try:
            import tensorflow as tf

            with self._ensure().as_default():
                for tag, img in images.items():
                    tf.summary.image(tag, img[None], step=step)
                self._writer.flush()
        except ImportError:
            pass


def eval_dict_to_text(results: Dict[str, Dict[str, Dict[str, float]]]) -> str:
    """{dataset: {task: {metric: value}}} -> aligned text table
    (reference eval_dic_to_text, logging_util.py:95-112)."""
    lines = []
    for ds_name, per_task in results.items():
        for task, metrics in per_task.items():
            lines.append(f"== {ds_name} / {task} ==")
            if not metrics:
                lines.append("  (no metrics)")
                continue
            width = max(len(k) for k in metrics)
            for k, v in metrics.items():
                try:
                    lines.append(f"  {k:<{width}} : {float(v):.6f}")
                except (TypeError, ValueError):
                    lines.append(f"  {k:<{width}} : {v}")
    return "\n".join(lines)


def eval_dict_to_csv(results, path: str) -> None:
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["dataset", "task", "metric", "value"])
        for ds_name, per_task in results.items():
            for task, metrics in per_task.items():
                for k, v in metrics.items():
                    try:
                        w.writerow([ds_name, task, k, float(v)])
                    except (TypeError, ValueError):
                        w.writerow([ds_name, task, k, v])
