"""Train state, optimizer, and the jit-compiled training step.

TPU-first rebuild of the hot loop of
/root/reference/src/trainer/stablemtl_trainer.py:215-343:

- The whole step (3 VAE encodes, child forwards, main UNet fwd/bwd, Adam
  update) is ONE jitted function; under a mesh the batch is sharded over
  `data` and XLA emits the gradient all-reduce over ICI.
- The three VAE encodes of a step (rgb, rgb_next, GT) are fused into a single
  batched encoder call (vs. three sequential calls, trainer:262-272) —
  bigger matmuls onto the MXU.
- Per-step randomness is `jax.random.fold_in(base, step)` (replacing the
  checkpointed python seed list, trainer:245-248 / util/seeding.py:27-54);
  resume-reproducibility follows from the step counter alone.
- Grad accumulation uses optax.MultiSteps (reference: accelerator.accumulate,
  trainer:300); the data schedule keeps one task per effective batch
  (mixed_sampler.py:91-94) so accumulated micro-batches share a task.
- Inactive per-task parameter banks receive exact zero gradients (JAX is
  correct by construction where the reference needs DDP
  find_unused_parameters=True, train_stablemtl.py:176). NOTE the resulting
  Adam semantics: optax applies a zero-grad update (moments decay) while
  torch DDP skips untouched params entirely — documented divergence
  (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from .pipeline import StableMTLPipeline
from .utils.loss import masked_mean
from .utils.schedules import iter_exponential_schedule


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray                  # micro-step counter (int32)
    params: Any                        # trainable UNet params
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    lr: float = 1e-4                       # trainer:116
    max_grad_norm: float = 5.0             # trainer:334-335
    total_iters: int = 25_000              # train_base_config.yaml:50-57
    final_ratio: float = 0.01
    warmup_steps: int = 100
    accumulation_steps: int = 1            # eff_bs / (bs * n_devices)
    use_schedule: bool = True
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    # memory knobs (the reference assumes 8x A100-80G; on one 16G chip the
    # Adam moments alone are ~7G for the 0.86B-param UNet):
    optimizer: str = "adam"                # adam | adamw | adafactor
    mu_dtype: Optional[str] = None         # e.g. 'bfloat16' halves 1st moment
    # robustness: drop steps with non-finite grads instead of poisoning the
    # params (the reference only logs a NaN warning, trainer:307-308)
    skip_nonfinite_updates: int = 0        # 0 = off; N = max consecutive skips


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    lr = iter_exponential_schedule(
        cfg.lr, cfg.total_iters, cfg.final_ratio, cfg.warmup_steps) \
        if cfg.use_schedule else cfg.lr
    mu_dtype = cfg.mu_dtype
    if cfg.optimizer == "adam":
        opt = optax.adam(lr, b1=cfg.b1, b2=cfg.b2, eps=cfg.eps,
                         mu_dtype=mu_dtype)
    elif cfg.optimizer == "adamw":
        opt = optax.adamw(lr, b1=cfg.b1, b2=cfg.b2, eps=cfg.eps,
                          mu_dtype=mu_dtype)
    elif cfg.optimizer == "adafactor":
        # factored second moments: O(sqrt(params)) state — the single-chip
        # training configuration for the full model
        opt = optax.adafactor(lr, multiply_by_parameter_scale=False,
                              clipping_threshold=None)
    else:
        raise ValueError(cfg.optimizer)
    tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), opt)
    if cfg.skip_nonfinite_updates > 0:
        tx = optax.apply_if_finite(tx, cfg.skip_nonfinite_updates)
    if cfg.accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accumulation_steps)
    return tx


class Optimizer:
    """GradientTransformation wrapper whose equality/hash is the
    OptimizerConfig it was built from, not object identity.

    TrainState.tx is static pytree METADATA (flax.struct.field
    pytree_node=False), and jit compares metadata by `==` when matching a
    call against a cached executable's in_shardings. Raw optax objects
    compare by identity, so a state restored into a fresh template (same
    config, different MultiSteps instance) would spuriously fail the
    pytree-structure check (seen in dryrun_multichip's post-restore step).
    Two optimizers from equal configs do the same math — compare as equal.
    """

    def __init__(self, tx: optax.GradientTransformation,
                 key: "OptimizerConfig"):
        self._tx = tx
        self.key = key

    def init(self, params):
        return self._tx.init(params)

    def update(self, grads, state, params=None):
        return self._tx.update(grads, state, params)

    def __eq__(self, other):
        return isinstance(other, Optimizer) and self.key == other.key

    def __hash__(self):
        return hash(self.key)

    def __repr__(self):
        return f"Optimizer({self.key.optimizer}, accum="\
               f"{self.key.accumulation_steps})"


def create_train_state(unet_params, cfg: OptimizerConfig) -> TrainState:
    tx = Optimizer(make_optimizer(cfg), cfg)
    return TrainState(step=jnp.asarray(0, jnp.int32), params=unet_params,
                      opt_state=tx.init(unet_params), tx=tx)


def eval_state(unet_params, step: int = 0) -> TrainState:
    """Params-only state for eval/serving entry points. No optimizer is
    constructed — tx.init would allocate Adam moments (~2x params) on a
    chip that only needs inference; the reference eval likewise loads only
    the UNet weights (eval_mtl.py:317-344)."""
    return TrainState(step=jnp.asarray(step, jnp.int32),
                      params=unet_params, opt_state=None, tx=None)


# ---------------------------------------------------------------------------
# Loss pieces
# ---------------------------------------------------------------------------

def downsample_valid_mask(valid_mask):
    """8x invalid-dominant max-pool of the pixel valid mask -> latent mask.

    Parity: trainer `downsample_mask` (stablemtl_trainer.py:199-213) — a
    latent cell is valid only if ALL 8x8 pixels under it are valid; returned
    [B, h, w, 1] (broadcasts over the 4 latent channels).
    """
    invalid = (~valid_mask.astype(bool)).astype(jnp.float32)
    pooled = jax.lax.reduce_window(
        invalid, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 8, 8, 1), window_strides=(1, 8, 8, 1),
        padding="VALID")
    return pooled < 0.5


def compute_grad_norm_stats(grads):
    """Mean/std of per-parameter gradient norms (reference loss.py:70-86)."""
    norms = jnp.stack([jnp.linalg.norm(g.ravel())
                       for g in jax.tree_util.tree_leaves(grads)])
    return norms.mean(), norms.std()


# ---------------------------------------------------------------------------
# Train step
# ---------------------------------------------------------------------------

def frozen_params_of(pipeline: StableMTLPipeline) -> dict:
    """The non-trainable parameter pytree, passed as a jit ARGUMENT (not a
    closure constant, which XLA would bake into the executable)."""
    out = {"vae": pipeline.vae_params, "text": pipeline.text_embed_table}
    if pipeline.is_multi_stream:
        out["child"] = pipeline.unet_child_params
    return out


def _bind_frozen(pipeline: StableMTLPipeline, frozen: dict) -> StableMTLPipeline:
    return dataclasses.replace(
        pipeline, vae_params=frozen["vae"], text_embed_table=frozen["text"],
        unet_child_params=frozen.get("child"))


def make_train_step(pipeline: StableMTLPipeline, base_seed: int = 0,
                    donate: bool = True,
                    compute_grad_stats: bool = False) -> Callable:
    """Build the jitted train step for this pipeline.

    The returned fn: (state, batch) -> (state, metrics) where batch is a dict
    with NHWC float32 arrays `rgb_norm`, `rgb_next_norm`, `target_3ch`,
    bool `valid_mask` [B,H,W,1], and int32 scalar `task_idx`. The task is
    *data*: one executable serves all seven tasks.
    """
    multi_stream = pipeline.is_multi_stream
    uses_taskmask_rng = multi_stream and (
        pipeline.unet.config.attn_mask_ratio > 0.0)
    frozen_in = frozen_params_of(pipeline)

    def loss_fn(params, frozen, batch, rng):
        pipe = _bind_frozen(pipeline, frozen)
        rgb = batch["rgb_norm"]
        rgb_next = batch["rgb_next_norm"]
        gt3 = batch["target_3ch"]
        task_idx = batch["task_idx"]

        # one fused VAE encode for [rgb | rgb_next | gt]  (vs 3 calls)
        stacked = jnp.concatenate([rgb, rgb_next, gt3], axis=0)
        lat_all = pipe.encode_rgb(stacked)
        lat_all = jax.lax.stop_gradient(lat_all)
        lat, lat_next, gt_latent = jnp.split(lat_all, 3, axis=0)

        rngs = {"taskmask": jax.random.fold_in(rng, 1)} \
            if uses_taskmask_rng else None
        noise_rng = jax.random.fold_in(rng, 2)
        pred = pipe.unet_forward(
            lat, lat_next, task_idx, rng=noise_rng, params=params,
            train=True, rngs=rngs)

        mask = downsample_valid_mask(batch["valid_mask"])
        # prediction_type 'sample': target is the GT latent (trainer:323-326)
        loss = masked_mean((pred.astype(jnp.float32) - gt_latent) ** 2,
                           jnp.broadcast_to(mask, pred.shape))
        return loss, pred

    def train_step(state: TrainState, frozen, batch):
        rng = jax.random.fold_in(jax.random.PRNGKey(base_seed), state.step)
        (loss, pred), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, frozen, batch, rng)
        metrics = {"loss": loss,
                   "nan_pred": jnp.any(jnp.isnan(pred)).astype(jnp.float32)}
        if compute_grad_stats:
            gmean, gstd = compute_grad_norm_stats(grads)
            metrics.update(grad_norm_mean=gmean, grad_norm_std=gstd)
        state = state.apply_gradients(grads)
        return state, metrics

    donate_argnums = (0,) if donate else ()
    jitted = jax.jit(train_step, donate_argnums=donate_argnums)

    def step(state, batch):
        return jitted(state, frozen_in, batch)

    step.jitted = jitted
    step.frozen = frozen_in
    return step


def make_eval_step(pipeline: StableMTLPipeline) -> Callable:
    """Jitted inference step: (params, batch) -> clipped 3ch pred [B,H,W,3]."""
    frozen_in = frozen_params_of(pipeline)

    def eval_step(params, frozen, batch):
        pipe = dataclasses.replace(_bind_frozen(pipeline, frozen),
                                   unet_params=params)
        return pipe.infer(batch["rgb_norm"], batch["rgb_next_norm"],
                          batch["task_idx"])

    jitted = jax.jit(eval_step)

    def step(params, batch):
        return jitted(params, frozen_in, batch)

    step.jitted = jitted
    return step


def make_eval_tasks_step(pipeline: StableMTLPipeline) -> Callable:
    """Jitted subset multi-task inference with live params:
    (params, rgb, rgb_next, task_indices[K]) -> [K, B, H, W, 3]
    (shared VAE encode + child taps across the K tasks)."""
    frozen_in = frozen_params_of(pipeline)

    def eval_step(params, frozen, rgb, rgb_next, task_indices):
        pipe = dataclasses.replace(_bind_frozen(pipeline, frozen),
                                   unet_params=params)
        return pipe.infer_tasks(rgb, rgb_next, task_indices)

    jitted = jax.jit(eval_step)

    def step(params, rgb, rgb_next, task_indices):
        import jax.numpy as jnp

        return jitted(params, frozen_in, rgb, rgb_next,
                      jnp.asarray(task_indices, jnp.int32))

    step.jitted = jitted
    return step
