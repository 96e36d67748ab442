"""Training CLI — rebuild of reference train_stablemtl.py:67-431.

Usage:
    python -m stablemtl_tpu.cli.train --config config/train_stablemtl.yaml \
        --base_data_dir $BASE_DATA_DIR --output_dir output/run1

Auto-resumes if `<output_dir>/checkpoint/latest` exists (reference
train_stablemtl.py:193-209).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train StableMTL (TPU)")
    parser.add_argument("--config", required=True)
    parser.add_argument("--base_data_dir",
                        default=os.environ.get("BASE_DATA_DIR", "."))
    parser.add_argument("--output_dir", default="output/run")
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--exit_after", type=float, default=-1,
                        help="minutes before graceful exit w/ checkpoint")
    parser.add_argument("--no_lr_scheduler", action="store_true")
    parser.add_argument("--max_iter", type=int, default=None)
    parser.add_argument("--no_resume", action="store_true")
    parser.add_argument("--num_workers", type=int, default=None,
                        help="loader worker processes (overrides "
                             "dataloader.num_workers; 0 = in-process)")
    args = parser.parse_args(argv)

    # multi-host: jax.distributed.initialize BEFORE any other jax API
    # creates the backend (env-gated; no-op single-process). Reference
    # analogue: Accelerate's NCCL process group (train_stablemtl.py:176-184).
    from ..parallel.distributed import (is_main_process, loader_shard,
                                        maybe_initialize)

    maybe_initialize()

    import jax

    from ..checkpoint import CheckpointManager
    from ..config import recursive_load_config
    from ..factory import (
        accumulation_steps_of,
        build_optimizer_config,
        build_pipeline,
        build_train_loader,
        build_val_datasets,
        class_colors,
    )
    from ..train_state import create_train_state
    from ..trainer import StableMTLTrainer, TrainerConfig
    from ..utils.compilation_cache import enable_persistent_cache
    from ..utils.logging_util import setup_logging, TensorBoardWriter

    enable_persistent_cache()
    cfg = recursive_load_config(
        args.config, root=os.path.dirname(os.path.dirname(
            os.path.abspath(args.config))))
    os.makedirs(args.output_dir, exist_ok=True)
    setup_logging(os.path.join(args.output_dir,
                               cfg.get("logging", {}).get("filename",
                                                          "logging.log")))
    log = logging.getLogger("train")

    # archive the resolved config + a code snapshot — process 0 only
    # (reference train_stablemtl.py:222-236; vis/TB/snapshots are host
    # artifacts, checkpoint saves stay collective for sharded arrays)
    main_proc = is_main_process()
    if main_proc:
        with open(os.path.join(args.output_dir, "config_resolved.json"),
                  "w") as f:
            json.dump(cfg.to_dict(), f, indent=2, default=str)
        try:
            import tarfile

            pkg_dir = os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))
            snap = os.path.join(args.output_dir, "code_snapshot.tar.gz")
            if not os.path.exists(snap):
                with tarfile.open(snap, "w:gz") as tar:
                    tar.add(pkg_dir, arcname="stablemtl_tpu",
                            filter=lambda ti: None
                            if "__pycache__" in ti.name else ti)
        except OSError:
            pass

    seed = args.seed if args.seed is not None else \
        int(cfg.get("trainer", {}).get("init_seed", 2024))
    n_devices = jax.device_count()
    accum, per_step = accumulation_steps_of(cfg, n_devices)
    log.info("devices=%d (process %d/%d, %d local) accumulation=%d "
             "per_step_batch=%d", n_devices, jax.process_index(),
             jax.process_count(), jax.local_device_count(), accum, per_step)

    pipeline = build_pipeline(cfg, seed=seed)
    opt_cfg = build_optimizer_config(cfg, accum)
    if args.no_lr_scheduler:
        opt_cfg = opt_cfg.__class__(**{**opt_cfg.__dict__,
                                       "use_schedule": False})
    state = create_train_state(pipeline.unet_params, opt_cfg)
    # Drop the builder's reference to the trainable params: the train step
    # reads them from the (donated) state and eval rebinds from state.params,
    # so keeping pipeline.unet_params alive would pin a second params-sized
    # f32 buffer — exactly what makes the full-size 512x512 single-chip step
    # OOM (measured, tools/bench_train512.py; CLAUDE.md HBM notes).
    pipeline.unet_params = None

    # multi-device: explicit (data x model) mesh — batch sharded over
    # `data`, optional tensor parallelism over `model`, ZeRO-1 moments
    # (config `parallel: {model: M, zero1: bool}`; reference scope is DDP
    # via Accelerate, train_stablemtl.py:176-184)
    pcfg = cfg.get("parallel", {})
    model_axis = int(pcfg.get("model", 1))
    train_step_fn = None
    if n_devices > 1 or model_axis > 1:
        from ..parallel import MeshConfig, make_mesh, shard_batch
        from ..parallel.sharded_train import (make_sharded_train_step,
                                              shard_train_state)

        mesh = make_mesh(MeshConfig(model=model_axis))
        tp = model_axis > 1
        zero1 = bool(pcfg.get("zero1", True))
        log.info("mesh %s tp=%s zero1=%s", dict(mesh.shape), tp, zero1)
        state = shard_train_state(state, mesh, zero1=zero1, tp=tp)
        sharded_step = make_sharded_train_step(
            pipeline, mesh, base_seed=seed, zero1=zero1, tp=tp,
            compute_grad_stats=bool(cfg.get("trainer", {})
                                    .get("log_grad_norm", False)))

        def train_step_fn(st, batch):
            return sharded_step(st, shard_batch(batch, mesh))

    loader = build_train_loader(cfg, args.base_data_dir, accum,
                                per_step, seed=int(cfg["dataloader"]
                                                   .get("seed", seed)),
                                shard=loader_shard(),
                                num_workers=args.num_workers)
    val_datasets = build_val_datasets(cfg, args.base_data_dir, "val")
    # vis writes PNGs — a host artifact, process 0 only
    vis_datasets = (build_val_datasets(cfg, args.base_data_dir, "vis")
                    if main_proc else [])

    tcfg_src = cfg.get("trainer", {})
    tcfg = TrainerConfig(
        max_iter=int(args.max_iter or cfg.get("max_iter", 20000)),
        gradient_accumulation_steps=accum,
        save_period=int(tcfg_src.get("save_period", 500)),
        backup_period=int(tcfg_src.get("backup_period", 1000)),
        validation_period=int(tcfg_src.get("validation_period", 1000)),
        visualization_period=int(tcfg_src.get("visualization_period", 2000)),
        log_period=int(tcfg_src.get("log_period", 50)),
        log_grad_norm=bool(tcfg_src.get("log_grad_norm", False)),
        main_val_metric=str(tcfg_src.get("main_val_metric", "")),
        main_val_metric_goal=str(tcfg_src.get("main_val_metric_goal",
                                              "minimize")),
        exit_after_minutes=args.exit_after,
        base_seed=seed,
        output_dir=args.output_dir,
    )
    ckpt = CheckpointManager(os.path.join(args.output_dir, "checkpoint"))
    writer = (TensorBoardWriter(os.path.join(args.output_dir, "tensorboard"))
              if main_proc else None)

    trainer = StableMTLTrainer(
        pipeline, state, loader, tcfg, ckpt=ckpt,
        val_datasets=val_datasets, vis_datasets=vis_datasets,
        metric_writer=writer, class_colors=class_colors(),
        train_step_fn=train_step_fn)
    if not args.no_resume:
        trainer.maybe_resume()
    trainer.train()
    # final save only when the run actually completed — an exit_after
    # interruption already wrote `latest` with interrupted meta, and
    # overwriting it here would (a) drop best_metric/loss_ema from the
    # meta (resume would then treat any later validation as a new best)
    # and (b) mark an unfinished run finished
    if trainer.effective_iter >= tcfg.max_iter:
        ckpt.save(trainer.state,
                  meta={"finished": True,
                        "effective_iter": trainer.effective_iter,
                        "loss_ema": trainer.loss_ema,
                        "best_metric": trainer.best_metric})
    log.info("training done at step %d", int(trainer.state.step))


if __name__ == "__main__":
    main()
