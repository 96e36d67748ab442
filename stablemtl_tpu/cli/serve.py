"""Serving CLI — drive the serving subsystem end-to-end.

Two modes (the reference has no serving surface; see
stablemtl_tpu/serving.py):

  # offline batch: process images through the micro-batched session
  python -m stablemtl_tpu.cli.serve --config cfg.yaml --checkpoint ckpt \\
      --images a.png b.png --output_dir out --res 512 --batch 8

  # export the AOT artifact (StableHLO; weights stay in the checkpoint)
  python -m stablemtl_tpu.cli.serve --config cfg.yaml \\
      --export all_tasks.stablehlo --batch 8 --res 512 [--pair]

Every image is resized to --res x --res (one compiled executable serves
one geometry), run through the fused all-task step, and each task's
prediction is written as `<stem>_<task>.png` (visualization) plus
`<stem>.npz` (raw task-space outputs) when --save_npz is given.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="Serve StableMTL (TPU)")
    parser.add_argument("--config", required=True,
                        help="yaml config or a training output dir")
    parser.add_argument("--checkpoint", default=None,
                        help="checkpoint dir (with `latest`); defaults to "
                             "<config dir>/checkpoint for run dirs")
    parser.add_argument("--images", nargs="*", default=[],
                        help="input image files (uint8)")
    parser.add_argument("--output_dir", default="output/serve")
    parser.add_argument("--res", type=int, default=512,
                        help="serving resolution (one executable per shape)")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--max_delay_ms", type=float, default=5.0)
    parser.add_argument("--save_npz", action="store_true",
                        help="also save raw task-space outputs per image")
    parser.add_argument("--export", default=None, metavar="PATH",
                        help="write the AOT StableHLO artifact and exit")
    parser.add_argument("--pair", action="store_true",
                        help="export the two-frame (rgb, rgb_next) entry")
    parser.add_argument("--seed", type=int, default=2024)
    args = parser.parse_args(argv)

    from ..config import resolve_config_arg
    from ..factory import build_pipeline, class_colors
    from ..utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()
    cfg, implied_ckpt = resolve_config_arg(args.config)
    if args.checkpoint is None:
        args.checkpoint = implied_ckpt

    pipeline = build_pipeline(cfg, seed=args.seed)
    if args.checkpoint:
        from ..checkpoint import restore_params

        step, params = restore_params(args.checkpoint, pipeline.unet_params)
        pipeline.unet_params = params
        print(f"# restored checkpoint params at step {step}")
    if cfg.get("model", {}).get("compute_dtype", "float32") == "bfloat16":
        from ..serving import cast_params_for_inference

        pipeline = cast_params_for_inference(pipeline)

    if args.export:
        from ..serving import export_pipeline

        blob = export_pipeline(pipeline, batch=args.batch,
                               res_hw=(args.res, args.res), pair=args.pair,
                               path=args.export)
        print(json.dumps({"artifact": args.export, "bytes": len(blob),
                          "batch": args.batch, "res": args.res,
                          "pair": args.pair}))
        return

    if not args.images:
        raise SystemExit("no --images given (and --export not requested)")

    import cv2
    import numpy as np

    from ..evaluation import postprocess_prediction
    from ..pipeline import TASKS
    from ..predict import _to_norm, _visualize
    from ..serving import ServingSession

    os.makedirs(args.output_dir, exist_ok=True)
    colors = class_colors()

    def load(path):
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise SystemExit(f"could not read image: {path}")
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if img.shape[:2] != (args.res, args.res):
            img = cv2.resize(img, (args.res, args.res),
                             interpolation=cv2.INTER_AREA)
        return _to_norm(img)

    # decode ALL images before submitting: loading inline would space the
    # submits further apart than max_delay_ms and every image would run as
    # its own fully-padded batch (batch x wasted device time)
    loaded = [(p, load(p)) for p in args.images]
    with ServingSession(pipeline, batch=args.batch,
                        max_delay_s=args.max_delay_ms / 1000.0) as sess:
        futures = [(p, sess.submit(img)) for p, img in loaded]
        for path, fut in futures:
            out = fut.result()  # [n_tasks, res, res, 3]
            stem = os.path.splitext(os.path.basename(path))[0]
            raw = {}
            for ti, task in enumerate(TASKS):
                pred = postprocess_prediction(task, out[ti], colors)
                raw[task] = pred
                vis = _visualize(task, pred, colors)
                if vis.ndim == 2:
                    vis = np.stack([vis] * 3, axis=-1)
                cv2.imwrite(
                    os.path.join(args.output_dir, f"{stem}_{task}.png"),
                    cv2.cvtColor(vis, cv2.COLOR_RGB2BGR))
            if args.save_npz:
                np.savez(os.path.join(args.output_dir, f"{stem}.npz"),
                         **raw)
            print(f"# {path} -> {args.output_dir}/{stem}_<task>.png")
    print(json.dumps({"served": len(futures), "tasks": len(TASKS),
                      "output_dir": args.output_dir}))


if __name__ == "__main__":
    main()
