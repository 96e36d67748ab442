#!/usr/bin/env python
"""Full-size on-chip training soak: trainer + loader(+workers) + evaluator.

Runs the REAL StableMTLTrainer loop (not a bare step chain) for a few
hundred micro-steps at 288x384 (the reference's training geometry,
train_base_config.yaml) on the full-width SD2 model with synthetic
mixed-task data that has LEARNABLE structure (depth = brightness ramp,
normal = brightness gradient field), so the loss curve must descend.
Includes one mid-run validation pass (real Evaluator: lstsq depth
alignment + metrics) and one visualization pass (GT/pred PNG panels).

Axon-tunnel constraints (CLAUDE.md):
- scalars stream back per step (loss floats) — safe;
- validation/vis fetch decoded predictions: val datasets are kept at
  64x96 with eval_batch_size 1 (~73 KB/fetch), far under the MB-scale
  fetches that wedge the tunnel;
- NO checkpoint save: orbax would pull the ~3.4 GB param tree through
  the tunnel's catastrophic device->host direction. Checkpoint/resume is
  proven end-to-end on the virtual 8-device mesh instead
  (tests/test_cli_e2e.py); pass STABLEMTL_SOAK_SAVE=1 on real
  (non-tunnel) hardware to exercise it here too.

Env: STABLEMTL_SOAK_ITERS (250 effective), STABLEMTL_BENCH_BATCH (4),
     STABLEMTL_SOAK_ACCUM (2), STABLEMTL_SOAK_RES ("288x384"),
     STABLEMTL_SOAK_WORKERS (2), STABLEMTL_SOAK_SAVE (0),
     STABLEMTL_SOAK_TASKS (all 7 task families by default).
Usage: python tools/train_soak.py   (on the TPU; ~25-40 min, compile-heavy)
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


SOAK_TASKS = ("depth", "normal", "semantic", "optical_flow", "scene_flow",
              "albedo", "shading")


class SoakDS:
    """Synthetic in-memory dataset with a learnable rgb->target mapping,
    one instance per task family (all 7; VERDICT r4 #4).

    Deterministic per index (smooth low-frequency rgb fields); targets:
    - depth: affine in brightness (range [2, 32] m),
    - normal: unit normals from the brightness gradient,
    - semantic: brightness quantized into 8 classes, target = the class
      palette color in [-1,1] (the space the decoder is matched against),
    - optical_flow / scene_flow: TWO-FRAME — rgb_next is rgb rolled by a
      per-index pixel shift s (never 0), flow fields are affine in (s,
      brightness) so the pair determines the target,
    - albedo: the rgb itself ([0,1] raw field), shading: brightness.
    Exposes BOTH the training fields (output/valid_mask) and the eval
    fields (depth_raw_linear / normal / semantic_class_id /
    optical_flow_raw / scene_flow / albedo / shading), so one class
    serves the loader, the Evaluator, and the visualizer. Module-level:
    picklable for the loader's spawn worker pool.
    """

    min_depth = 0.1
    max_depth = 80.0

    def __init__(self, task: str, n: int, h: int, w: int, class_colors=None):
        assert task in SOAK_TASKS
        self.output_type = task
        self.disp_name = f"soak_{task}_{h}x{w}"
        self.n, self.h, self.w = n, h, w
        self.class_colors = class_colors

    def __len__(self):
        return self.n

    def _rgb(self, idx: int) -> np.ndarray:
        import cv2

        r = np.random.default_rng(np.random.SeedSequence([977, idx]))
        low = r.uniform(-1, 1, (9, 12, 3)).astype(np.float32)
        return np.clip(cv2.resize(low, (self.w, self.h),
                                  interpolation=cv2.INTER_CUBIC), -1, 1)

    def get(self, idx: int, rng=None) -> dict:
        task = self.output_type
        rgb = self._rgb(idx)
        b = rgb.mean(-1)                                  # [-1, 1]
        sample = {"rgb_norm": rgb, "output_type": task,
                  "valid_mask": np.ones((self.h, self.w, 1), bool)}
        sample["rgb_next_norm"] = sample["rgb_norm"]      # single-frame
        if task == "depth":
            depth = 2.0 + 30.0 * (b + 1.0) / 2.0          # [2, 32] m
            # fixed affine normalization: a consistent learnable mapping
            sample["output"] = ((depth - 2.0) / 30.0 * 2.0
                                - 1.0)[..., None].astype(np.float32)
            sample["depth_raw_linear"] = depth[..., None].astype(np.float32)
        elif task == "normal":
            gy, gx = np.gradient(b)
            nvec = np.stack([-gx * 40.0, -gy * 40.0, np.ones_like(b)], -1)
            nvec /= np.linalg.norm(nvec, axis=-1, keepdims=True)
            sample["output"] = nvec.astype(np.float32)
            sample["normal"] = nvec.astype(np.float32)
        elif task == "semantic":
            cls = np.clip(((b + 1.0) / 2.0 * 8).astype(np.int64), 0, 7)
            palette = (np.asarray(self.class_colors, np.float32)
                       / 255.0 * 2.0 - 1.0)               # [K,3] in [-1,1]
            sample["output"] = palette[cls]
            sample["semantic_class_id"] = cls[..., None]
        elif task in ("optical_flow", "scene_flow"):
            s = (-3, -1, 1, 3)[idx % 4]                   # px shift, never 0
            sample["rgb_next_norm"] = np.roll(rgb, s, axis=1)
            if task == "optical_flow":
                raw = np.stack([s + 0.5 * b, -0.5 * b], -1)  # [H,W,2] px
                sample["output"] = (raw / 4.0).astype(np.float32)
                sample["optical_flow_raw"] = raw.astype(np.float32)
            else:
                raw = np.stack([0.1 * s + 0.05 * b, -0.05 * b,
                                0.05 * (b + 1.0)], -1)    # [H,W,3] m
                sample["output"] = (raw / 0.5).astype(np.float32)
                sample["scene_flow"] = raw.astype(np.float32)
        elif task == "albedo":
            sample["output"] = rgb
            sample["albedo"] = ((rgb + 1.0) / 2.0).astype(np.float32)
        else:  # shading
            sample["output"] = b[..., None].astype(np.float32)
            sample["shading"] = ((b[..., None] + 1.0) / 2.0
                                 ).astype(np.float32)
        return sample


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from stablemtl_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()

    from bench_train512 import build  # full-size pipeline builder

    from stablemtl_tpu.data.loader import MixedTaskLoader
    from stablemtl_tpu.train_state import (OptimizerConfig,
                                           create_train_state,
                                           make_train_step)
    from stablemtl_tpu.trainer import StableMTLTrainer, TrainerConfig

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")

    on_tpu = jax.default_backend() not in ("cpu",)
    iters = int(os.environ.get("STABLEMTL_SOAK_ITERS",
                               "250" if on_tpu else "4"))
    batch = int(os.environ.get("STABLEMTL_BENCH_BATCH", "4"))
    accum = int(os.environ.get("STABLEMTL_SOAK_ACCUM", "2"))
    h, w = (int(x) for x in os.environ.get(
        "STABLEMTL_SOAK_RES", "288x384" if on_tpu else "32x32").split("x"))
    workers = int(os.environ.get("STABLEMTL_SOAK_WORKERS", "2"))
    out_dir = os.environ.get("STABLEMTL_SOAK_OUT", "/tmp/soak_out")

    pipe = build(128 if on_tpu else 32,
                 "bfloat16" if on_tpu else "float32")
    state = create_train_state(
        pipe.unet_params,
        OptimizerConfig(optimizer="adafactor", use_schedule=True,
                        accumulation_steps=accum))
    pipe.unet_params = None  # single-chip HBM fit (cli/train.py pattern)

    from stablemtl_tpu.factory import class_colors

    colors = class_colors()
    task_env = os.environ.get("STABLEMTL_SOAK_TASKS", ",".join(SOAK_TASKS))
    tasks = [t.strip() for t in task_env.split(",") if t.strip()]
    train_sets = [SoakDS(t, 64, h, w, colors) for t in tasks]
    # val res: divisible by 64 (latent /8 plus three UNet halvings) and
    # small enough that each decoded-pred fetch is ~100 KB (tunnel-safe)
    vh, vw = (64, 128) if on_tpu else (32, 32)
    val_sets = [SoakDS(t, 2, vh, vw, colors) for t in tasks]
    loader = MixedTaskLoader(train_sets, batch_size=batch,
                             accumulation_steps=accum, seed=7,
                             num_workers=workers)

    curve = []

    def metric_writer(step, scalars):
        rec = {"step": step, **{k: round(float(v), 5)
                                for k, v in scalars.items()}}
        curve.append(rec)
        print(json.dumps(rec), flush=True)

    cfg = TrainerConfig(
        max_iter=iters, gradient_accumulation_steps=accum,
        save_period=10 ** 9, backup_period=10 ** 9,
        validation_period=max(iters * 3 // 5, 1),   # fires once mid-run
        visualization_period=max(iters * 4 // 5, 1),
        log_period=10, eval_batch_size=1, output_dir=out_dir, base_seed=7)
    trainer = StableMTLTrainer(
        pipe, state, loader, cfg, ckpt=None, val_datasets=val_sets,
        vis_datasets=val_sets, metric_writer=metric_writer,
        class_colors=colors,
        train_step_fn=make_train_step(pipe, base_seed=7, donate=True))

    t0 = time.time()
    trainer.train()
    wall = time.time() - t0

    losses = [c["loss"] for c in curve if "loss" in c]
    head = float(np.mean(losses[:3])) if len(losses) >= 6 else None
    tail = float(np.mean(losses[-3:])) if len(losses) >= 6 else None
    print(json.dumps({
        "soak": f"{h}x{w}_b{batch}_accum{accum}_workers{workers}",
        "effective_iters": iters, "wall_s": round(wall, 1),
        "s_per_effective_iter": round(wall / max(iters, 1), 3),
        "loss_first3_mean": head, "loss_last3_mean": tail,
        "descended": (head is not None and tail is not None
                      and tail < head)}), flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
