"""Evaluation CLI — rebuild of reference eval_mtl.py:69-344.

Usage:
    python -m stablemtl_tpu.cli.eval --config config/train_stablemtl.yaml \
        --checkpoint output/run1/checkpoint --base_data_dir $BASE_DATA_DIR \
        --split test --output_dir output/run1/eval

Loads the run's config (or a given one), restores the checkpoint, runs the
per-task metric suite over the requested split, and writes tabulated + CSV
results (reference logging_util.py:95-112).
"""

from __future__ import annotations

import argparse
import json
import logging
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="Evaluate StableMTL (TPU)")
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", default=None,
                        help="checkpoint dir (with `latest`)")
    parser.add_argument("--base_data_dir",
                        default=os.environ.get("BASE_DATA_DIR", "."))
    parser.add_argument("--output_dir", default="output/eval")
    parser.add_argument("--split", default="test", choices=["val", "test"])
    parser.add_argument("--max_samples", type=int, default=None,
                        help="debug-style truncation (eval_mtl.py:254-276)")
    parser.add_argument("--save_predictions", action="store_true",
                        help="save per-sample prediction visualizations")
    parser.add_argument("--seed", type=int, default=2024)
    parser.add_argument("--eval_batch_size", type=int, default=4,
                        help="device batch for eval inference (metrics are "
                             "still per-sample)")
    args = parser.parse_args(argv)

    from ..factory import build_pipeline, build_val_datasets, class_colors
    from ..train_state import eval_state
    from ..trainer import StableMTLTrainer, TrainerConfig
    from ..utils.compilation_cache import enable_persistent_cache
    from ..utils.logging_util import (
        eval_dict_to_csv,
        eval_dict_to_text,
        setup_logging,
    )

    enable_persistent_cache()
    # --config may be a training OUTPUT DIR: reload the run's archived
    # config (reference eval_mtl.py:180-194 resume-config loading)
    from ..config import resolve_config_arg

    cfg, implied_ckpt = resolve_config_arg(args.config)
    if args.checkpoint is None:
        args.checkpoint = implied_ckpt
    os.makedirs(args.output_dir, exist_ok=True)
    setup_logging(os.path.join(args.output_dir, "eval.log"))
    log = logging.getLogger("eval")

    import jax

    pipeline = build_pipeline(cfg, seed=args.seed)
    step, params = 0, pipeline.unet_params
    if args.checkpoint:
        # params-only restore: the checkpoint's opt_state tree depends on the
        # training accumulation_steps (MultiStepsState) and is irrelevant to
        # eval (reference loads only the UNet, eval_mtl.py:317-344) — no
        # optimizer is constructed at all (Adam moments are ~2x params of
        # wasted HBM on an inference-only chip)
        from ..checkpoint import restore_params

        step, params = restore_params(args.checkpoint, params)
        log.info("restored checkpoint params at step %d", step)
    # device-resident ONCE: host-numpy params would be re-shipped on every
    # jitted eval call (CLAUDE.md hazard, measured 6x slowdown)
    state = eval_state(jax.device_put(params), step)
    # drop the builder's copy — eval rebinds from state.params (same
    # single-copy pattern as cli/train.py)
    pipeline.unet_params = None

    datasets = build_val_datasets(cfg, args.base_data_dir, args.split)
    trainer = StableMTLTrainer(
        pipeline, state, loader=None,
        config=TrainerConfig(eval_batch_size=args.eval_batch_size),
        val_datasets=datasets, class_colors=class_colors())
    results = trainer.validate(max_samples=args.max_samples)
    if args.save_predictions:
        trainer.visualize(os.path.join(args.output_dir, "predictions"),
                          max_samples=args.max_samples or 8)

    text = eval_dict_to_text(results)
    print(text)
    with open(os.path.join(args.output_dir, "eval_results.json"), "w") as f:
        json.dump(results, f, indent=2, default=float)
    with open(os.path.join(args.output_dir, "eval_results.txt"), "w") as f:
        f.write(text)
    eval_dict_to_csv(results, os.path.join(args.output_dir,
                                           "eval_results.csv"))
    log.info("wrote results to %s", args.output_dir)


if __name__ == "__main__":
    main()
