"""Config -> models / datasets / trainer assembly.

Replaces the wiring code of reference train_stablemtl.py:150-431 (dataset
construction, pipeline from_pretrained, setup_unet surgery, accelerator
prepare) with declarative builders. There is no module surgery: the model
variant (single- vs multi-stream, conv_in width, task banks) is fixed by
UNetConfig at construction, and pretrained weights are mapped onto that
structure by models.torch_convert.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import TASKS
from .config import Config, recursive_load_config
from .data import AugmentationConfig, DatasetMode, MixedTaskLoader, get_dataset
from .data.semantic import VKitti2Encoder
from .models import (
    AutoencoderKL,
    CLIPTextModel,
    CLIPTextConfig,
    UNet2DConditionModel,
)
from .models.unet import UNetConfig, inflate_conv_in, tiny_unet_config
from .models.vae import VAEConfig, tiny_vae_config
from .models.clip import tiny_clip_config
from .pipeline import N_TASKS, StableMTLPipeline, build_text_embed_table
from .train_state import OptimizerConfig, create_train_state
from .utils.normalizers import get_depth_normalizer

log = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Model configs by preset
# ---------------------------------------------------------------------------

def model_configs(preset: str, multi_stream: bool, trainer_cfg,
                  dtype: str = "float32", remat: bool = False,
                  fast_math: bool = False, remat_transformer: str = "none"
                  ) -> Tuple[UNetConfig, UNetConfig, VAEConfig, int]:
    """(main unet cfg, child unet cfg, vae cfg, text_dim)."""
    t = trainer_cfg or {}
    get = lambda k, d: t.get(k, d) if hasattr(t, "get") else d
    task_kw = dict(
        use_task_attention=multi_stream,
        n_attns=int(get("n_attns", 4)),
        attn_mask_ratio=float(get("attn_mask_ratio", 0.0)),
        attn_mask_type=str(get("attn_mask_type", "attn_prob")),
        task_attn_layers=str(get("apply_task_attn_to_layers", "all")),
        dtype=dtype, remat=remat, fast_math=fast_math,
        remat_transformer=remat_transformer,
    )
    fm = dict(dtype=dtype, fast_math=fast_math)
    if preset == "nano":
        # Depth-reduced topology (2 UNet stages -> 6 attention layers vs
        # 16) for the virtual-multichip dry run: every distinct block
        # kind, the full train-step path, and every sharding rule still
        # execute, but wall time on a 1-core virtual mesh scales with
        # layer count (each collective is a thread rendezvous).
        nano = dict(block_out_channels=(32, 64), attention_heads=(2, 2))
        return (tiny_unet_config(**nano, **task_kw),
                tiny_unet_config(**nano, **fm),
                tiny_vae_config(**fm),
                tiny_unet_config().cross_attention_dim)
    if preset == "tiny":
        return (tiny_unet_config(**task_kw),
                tiny_unet_config(**fm),
                tiny_vae_config(**fm),
                tiny_unet_config().cross_attention_dim)
    if preset == "small":
        base = dict(block_out_channels=(160, 320, 640, 640),
                    attention_heads=(5, 10, 20, 20))
        return (UNetConfig(**base, **task_kw),
                UNetConfig(**base, **fm),
                VAEConfig(block_out_channels=(64, 128, 256, 256),
                          **fm), 1024)
    if preset == "full":
        return (UNetConfig(**task_kw), UNetConfig(**fm),
                VAEConfig(**fm), 1024)
    raise ValueError(preset)


def init_params(module, rng, *args, **kwargs):
    return jax.jit(lambda r: module.init(r, *args, **kwargs))(rng)


def build_pipeline(cfg: Config, seed: int = 0) -> StableMTLPipeline:
    """Construct VAE + text table + UNet(s) per the config.

    model.pretrained_path == 'scratch' initializes from seed; otherwise it
    points to a directory of converted SD2 numpy weights
    (tools/convert_sd2.py writes vae.npz / unet.npz / text.npz).
    """
    trainer_cfg = cfg.get("trainer", {})
    multi_stream = bool(trainer_cfg.get("multi_stream", False)
                        if hasattr(trainer_cfg, "get") else False)
    model_cfg = cfg.get("model", {})
    preset = model_cfg.get("size_preset", "full")
    dtype = model_cfg.get("compute_dtype", "float32")
    remat = bool(model_cfg.get("remat", False))
    # fast_math (bf16 norms-in-compute-dtype + tanh gelu) defaults ON for
    # bf16 INFERENCE-oriented builds only when requested in the config
    fast_math = bool(model_cfg.get("fast_math", False))
    ucfg, ccfg, vcfg, text_dim = model_configs(
        preset, multi_stream, trainer_cfg, dtype=dtype, remat=remat,
        fast_math=fast_math,
        remat_transformer=str(model_cfg.get("remat_transformer", "none")))
    # 'avg' second-frame mode has one 4ch rgb group -> conv_in 8 channels
    # (reference util/model.py:191-194 repeat=2)
    pipe_cfg_early = cfg.get("pipeline", {})
    if pipe_cfg_early.get("encode_rgb_model", "duplicate") == "avg":
        ucfg = dataclasses.replace(ucfg, in_channels=8)
        ccfg = dataclasses.replace(ccfg, in_channels=8)

    rng = jax.random.PRNGKey(seed)
    k = jax.random.split(rng, 6)
    vae = AutoencoderKL(vcfg)
    unet = UNet2DConditionModel(ucfg)
    child = UNet2DConditionModel(ccfg) if multi_stream else None

    H = 64  # init geometry is irrelevant to the params
    lat = H // 8
    text = jnp.zeros((1, 5, text_dim))
    x12 = jnp.zeros((1, lat, lat, ucfg.in_channels))
    t0 = jnp.zeros((1,), jnp.int32)

    vae_params = init_params(vae, k[0], jnp.zeros((1, H, H, 3)))

    child_params = None
    feats = aux_idx = main_idx = None
    if multi_stream:
        child_params = init_params(child, k[1], x12, t0, text,
                                   tap="afterSelfAttn_residual")
        _, taps = child.apply(child_params, x12, t0, text,
                              tap="afterSelfAttn_residual")
        feats = [jnp.zeros((N_TASKS - 1,) + tp.shape) for tp in taps]
        aux_idx = jnp.arange(1, N_TASKS)
        main_idx = jnp.asarray(0)
    unet_params = init_params(unet, k[2], x12, t0, text, task_feats=feats,
                              main_idx=main_idx, aux_idx=aux_idx)

    pretrained = model_cfg.get("pretrained_path", "scratch")
    if pretrained and pretrained != "scratch":
        vae_params, unet_params, child_params, table = load_pretrained(
            pretrained, vae_params, unet_params, child_params, text_dim)
    else:
        if preset == "tiny":
            table = jax.random.normal(
                k[3], (N_TASKS, 5, text_dim)) * 0.02
        else:
            clip_cfg = CLIPTextConfig(dtype=dtype) \
                if preset == "full" else tiny_clip_config(
                    hidden_size=text_dim, num_heads=8, intermediate_size=2048)
            clip = CLIPTextModel(clip_cfg)
            clip_params = init_params(clip, k[4],
                                      jnp.zeros((1, 8), jnp.int32))
            table = build_text_embed_table(clip, clip_params)

    pipe_cfg = cfg.get("pipeline", {})
    return StableMTLPipeline(
        vae=vae, unet=unet, vae_params=vae_params, unet_params=unet_params,
        text_embed_table=jnp.asarray(table),
        unet_child=child, unet_child_params=child_params,
        input_noise=pipe_cfg.get("input_noise", "deterministic"),
        encode_rgb_mode=pipe_cfg.get("encode_rgb_model", "duplicate"),
        # chunked all-task VAE decode (pipeline.decode_chunk): caps the
        # decode HBM peak so larger inference batches fit (bench.py uses
        # 14 on a 15.75G v5e for batch 8 @512)
        decode_chunk=int(pipe_cfg.get("decode_chunk", 0)),
        exclude_main_task=bool(trainer_cfg.get(
            "exclude_mainstream_output_type", True)
            if hasattr(trainer_cfg, "get") else True),
        child_tap=str(trainer_cfg.get(
            "return_feature", "afterSelfAttn_residual")
            if hasattr(trainer_cfg, "get") else "afterSelfAttn_residual"),
    )


def load_pretrained(path: str, vae_params, unet_params, child_params,
                    text_dim: int, strict: bool = False):
    """Load converted-weight .npz files over the initialized structures.

    conv_in inflation is automatic: when the stored conv_in kernel has fewer
    input channels than the model (raw SD2 is 4-channel, the model is 12 —
    or 8 in 'avg' mode), it is tiled `expected/stored` times and scaled by
    1/repeat (reference util/model.py:11-27 repeat=3, :191-194 repeat=2).
    Any other expected key that is missing or shape-mismatched is a silent
    parity failure mode, so it is logged loudly (or raised with strict=True).
    """

    def load_over(params, npz_path, what: str):
        if not os.path.exists(npz_path):
            log.warning("pretrained file missing: %s (keeping init)",
                        npz_path)
            return params
        loaded = dict(np.load(npz_path))
        import flax
        flatmap = flax.traverse_util.flatten_dict(params)
        problems = []
        for kpath, v in flatmap.items():
            key = "/".join(str(p) for p in kpath)
            want = np.asarray(v).shape
            if key not in loaded:
                # task_attn banks don't exist in raw SD2 — they are fresh
                # additions (reference installs them at surgery time,
                # util/model.py:102-146), so their absence is expected
                if "task_attn" not in key:
                    problems.append(
                        f"{key}: missing (init kept, shape {want})")
                continue
            got = loaded[key]
            if got.shape == want:
                flatmap[kpath] = jnp.asarray(got)
            elif (key.endswith("conv_in/kernel") and got.ndim == 4
                    and got.shape[:2] == want[:2] and got.shape[3] == want[3]
                    and want[2] % got.shape[2] == 0):
                repeat = want[2] // got.shape[2]
                log.info("%s: inflating conv_in %d->%d input channels "
                         "(repeat=%d, scale 1/%d)", what, got.shape[2],
                         want[2], repeat, repeat)
                flatmap[kpath] = inflate_conv_in(
                    {"kernel": jnp.asarray(got), "bias": np.zeros(1)},
                    repeat=repeat)["kernel"]
            else:
                problems.append(
                    f"{key}: shape {got.shape} != expected {want} "
                    "(init kept)")
        if problems:
            msg = f"{what}: {len(problems)} parameter(s) NOT loaded from " \
                  f"{npz_path}:\n  " + "\n  ".join(problems[:20])
            if len(problems) > 20:
                msg += f"\n  ... and {len(problems) - 20} more"
            if strict:
                raise ValueError(msg)
            log.warning(msg)
        unused = set(loaded) - {"/".join(str(p) for p in k)
                                for k in flatmap}
        if unused:
            log.warning("%s: %d stored array(s) unused (e.g. %s)", what,
                        len(unused), sorted(unused)[:5])
        return flax.traverse_util.unflatten_dict(flatmap)

    vae_params = load_over(vae_params, os.path.join(path, "vae.npz"), "vae")
    unet_params = load_over(unet_params, os.path.join(path, "unet.npz"),
                            "unet")
    if child_params is not None:
        child_npz = os.path.join(path, "unet_child.npz")
        if not os.path.exists(child_npz):
            child_npz = os.path.join(path, "unet.npz")
        child_params = load_over(child_params, child_npz, "unet_child")
    table_path = os.path.join(path, "text_table.npy")
    if os.path.exists(table_path):
        table = np.load(table_path)
    else:
        # all-zero conditioning makes every task produce garbage with no
        # error downstream — this must be LOUD (same contract as the
        # per-key mismatch reporting above)
        log.warning("%s missing: text conditioning falls back to an "
                    "ALL-ZERO task-embedding table — predictions will be "
                    "meaningless until a real table is provided "
                    "(tools/convert_sd2.py writes it)", table_path)
        table = np.zeros((N_TASKS, 5, text_dim), np.float32)
    return vae_params, unet_params, child_params, table


# ---------------------------------------------------------------------------
# Data
# ---------------------------------------------------------------------------

def build_train_loader(cfg: Config, base_data_dir: str,
                       accumulation_steps: int, batch_size: int,
                       seed: int, shard=None,
                       num_workers=None) -> MixedTaskLoader:
    """num_workers: overrides cfg dataloader.num_workers when not None
    (the cli --num_workers flag)."""
    depth_norm = get_depth_normalizer(cfg.get("depth_normalization", {}))
    aug_cfg_tree = cfg.get("augmentation", {})

    train_cfg = cfg["dataset"]["train"]
    datasets = []
    for entry in train_cfg["dataset_list"]:
        entry = dict(entry)
        aug_key = entry.get("augmentation_key", "default")
        aug = AugmentationConfig.from_dict(
            aug_cfg_tree.get(aug_key) or aug_cfg_tree.get("default"))
        entry["augmentation"] = aug
        entry["depth_normalizer"] = depth_norm
        datasets.append(get_dataset(entry, base_data_dir, DatasetMode.TRAIN))
    prob = list(train_cfg.get("prob_ls")) if "prob_ls" in train_cfg else None
    return MixedTaskLoader(
        datasets, batch_size=batch_size,
        accumulation_steps=accumulation_steps, seed=seed, prob=prob,
        iterative_sampling=bool(cfg["dataloader"].get(
            "iterative_sampling", True)),
        prefetch=int(cfg["dataloader"].get("prefetch", 2)),
        num_workers=int(num_workers if num_workers is not None
                        else cfg["dataloader"].get("num_workers", 0)),
        shard=shard)


def build_val_datasets(cfg: Config, base_data_dir: str, split: str = "val"):
    out = []
    for entry in cfg["dataset"].get(split, []) or []:
        out.append(get_dataset(dict(entry), base_data_dir, DatasetMode.EVAL))
    return out


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------

def accumulation_steps_of(cfg: Config, n_devices: int) -> Tuple[int, int]:
    """(accumulation_steps, per-step batch) from effective batch math
    (reference train_stablemtl.py:165-168)."""
    dl = cfg["dataloader"]
    eff = int(dl.get("effective_batch_size", 32))
    max_bs = int(dl.get("max_train_batch_size", 4))
    n = max(n_devices, 1)
    # at least one sample per device (an effective batch smaller than the
    # device count cannot shard thinner than 1/device)
    per_dev = max(1, min(max_bs, eff // n))
    per_step = per_dev * n
    accum = max(1, eff // per_step)
    if accum * per_step != eff:
        # the reference ASSERTS divisibility (train_stablemtl.py:167);
        # here the device count participates too, so adapt — but never
        # silently change the training recipe's lr/batch ratio
        log.warning(
            "effective_batch_size %d is not divisible by per-step batch %d "
            "(%d devices x %d): training with effective batch %d instead",
            eff, per_step, n, per_dev, accum * per_step)
    return accum, per_step


def build_optimizer_config(cfg: Config, accumulation_steps: int
                           ) -> OptimizerConfig:
    sched = cfg.get("lr_scheduler", {})
    kw = sched.get("kwargs", {}) if hasattr(sched, "get") else {}
    opt = cfg.get("optimizer", {})
    get = lambda k, d: opt.get(k, d) if hasattr(opt, "get") else d
    return OptimizerConfig(
        lr=float(cfg.get("lr", 1e-4)),
        total_iters=int(kw.get("total_iter", cfg.get("max_iter", 25000))),
        final_ratio=float(kw.get("final_ratio", 0.01)),
        warmup_steps=int(kw.get("warmup_steps", 100)),
        accumulation_steps=accumulation_steps,
        use_schedule=bool(sched),
        optimizer=str(get("name", "adam")),
        mu_dtype=get("mu_dtype", None),
    )


def class_colors() -> np.ndarray:
    return VKitti2Encoder(n_classes=8).class_color_embeddings
