"""StableMTL pipeline: VAE codec, task conditioning, single-step inference.

TPU-first rebuild of reference /root/reference/src/stablemtl_pipeline.py.
Key design departures (SURVEY.md §7):

- The CLIP text tower never appears in the hot loop: the 7 task prompts are
  embedded once at setup into a [n_tasks, 77, 1024] table; conditioning is a
  gather by task index (vs. a CLIP forward per step, pipeline:464-473).
- The timestep is the constant 999 (pipeline:552) so its embedding folds into
  the compiled graph.
- Child-feature extraction runs ALL auxiliary tasks in ONE UNet forward with
  the task axis folded into batch (vs. a Python loop of 6 sequential child
  forwards, pipeline:495-513) — the dominant cost of a multi-stream step.
- Task identity is *data* (an int32 index), so one compiled executable serves
  every task; per-task branching is jnp.where over precomputed task tables.

Packing/decoding parity:
- GT -> 3ch packing (trainer encode_output, stablemtl_trainer.py:440-482):
  depth/shading tiled to 3 channels; optical flow [u,v] -> [u,v,u];
  normal/semantic/albedo/scene_flow already 3-channel.
- latent -> task decode (pipeline:626-656): depth/shading = mean over the 3
  decoded channels; optical_flow = first 2 channels; rest passthrough.
- Semantic class assignment: decoded RGB -> nearest of the 8 class palette
  colors (pipeline:354-366).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import FIXED_TIMESTEP, TASKS, TWO_FRAME_TASKS
from .models import AutoencoderKL, CLIPTextModel, UNet2DConditionModel

N_TASKS = len(TASKS)
TASK_INDEX = {name: i for i, name in enumerate(TASKS)}

# Boolean table: does task i consume a distinct second frame?
# (reference pipeline:433 — optical_flow / scene_flow only)
TWO_FRAME_TABLE = np.array([t in TWO_FRAME_TASKS for t in TASKS], dtype=bool)

# Text prompt for each task: the task name with '_' -> ' '
# (reference pipeline:465-467).
TASK_PROMPTS = tuple(t.replace("_", " ") for t in TASKS)

# Representatives of the two UNet-input groups: every task's input latent
# equals one of these two (second frame = configured single-frame mode vs
# the real next frame) — the basis of the shared-prefix fast path.
_SINGLE_FRAME_IDX = int(np.argmin(TWO_FRAME_TABLE))
_TWO_FRAME_IDX = int(np.argmax(TWO_FRAME_TABLE))


def task_index(name_or_idx) -> int:
    if isinstance(name_or_idx, str):
        return TASK_INDEX[name_or_idx]
    return int(name_or_idx)


# ---------------------------------------------------------------------------
# GT packing (host- or device-side; pure, shape-static per task)
# ---------------------------------------------------------------------------

def pack_gt_to_3ch(gt, task: str):
    """Task GT -> 3-channel [-1,1] image for VAE encoding.

    Parity: stablemtl_trainer.py:440-482 (`encode_output` channel rules).
    Accepts numpy or jnp arrays shaped [..., H, W, C] (channels-last).
    """
    xp = jnp if isinstance(gt, jnp.ndarray) else np
    c = gt.shape[-1]
    if task in ("depth", "shading"):
        if c != 1:
            raise ValueError(f"{task} GT must be 1-channel, got {c}")
        return xp.concatenate([gt, gt, gt], axis=-1)
    if task == "optical_flow":
        if c != 2:
            raise ValueError(f"optical_flow GT must be 2-channel, got {c}")
        return xp.concatenate([gt, gt[..., :1]], axis=-1)
    if task in ("normal", "semantic", "albedo", "scene_flow"):
        if c != 3:
            raise ValueError(f"{task} GT must be 3-channel, got {c}")
        return gt
    raise ValueError(f"Unknown output type: {task}")


def decode_3ch_to_task(img3, task: str):
    """Decoded 3-channel VAE output -> task-shaped map.

    Parity: stablemtl_pipeline.py:626-656 (`decode_output` channel rules).
    img3: [..., H, W, 3] channels-last.
    """
    if task in ("depth", "shading"):
        return img3.mean(axis=-1, keepdims=True)
    if task == "optical_flow":
        return img3[..., :2]
    if task in ("normal", "semantic", "rgb", "scene_flow", "albedo"):
        return img3
    raise ValueError(f"Unknown output type: {task}")


def semantic_rgb_to_class(img3, class_colors):
    """Decoded RGB [-1,1] -> class-id map by nearest palette color.

    Parity: stablemtl_pipeline.py:354-366 (cdist argmin over the 8 class
    colors, colors normalized from [0,255] to [-1,1]).
    img3: [..., H, W, 3]; class_colors: [n_cls, 3] in 0..255.
    """
    colors = jnp.asarray(class_colors, jnp.float32) / 255.0 * 2.0 - 1.0
    d2 = jnp.sum(
        (img3[..., None, :] - colors) ** 2, axis=-1)  # [..., H, W, n_cls]
    return jnp.argmin(d2, axis=-1)


# ---------------------------------------------------------------------------
# Pipeline
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class StableMTLPipeline:
    """Bundles the frozen codecs, the task-embedding table, and the UNets.

    Attributes:
        vae / unet / unet_child: Flax module definitions (child is None in
            single-stream mode).
        vae_params / unet_params / unet_child_params: parameter pytrees.
        text_embed_table: [n_tasks, L, text_dim] CLIP embeddings of the task
            prompts, precomputed by `build_text_embed_table`.
        input_noise: 'deterministic' (zeros, default) | 'random'
            (train_base_config.yaml; pipeline:557-562).
        encode_rgb_mode: 'duplicate' | 'zero' | 'avg' second-frame handling
            for single-frame tasks (pipeline:436-447).
        exclude_main_task: drop the main task from the child key set
            (train_stablemtl.yaml:22).
        child_tap: which feature tap the child exposes
            (default afterSelfAttn_residual, util/model.py:182-184).
    """

    vae: AutoencoderKL
    unet: UNet2DConditionModel
    vae_params: Any
    unet_params: Any
    text_embed_table: jnp.ndarray
    unet_child: Optional[UNet2DConditionModel] = None
    unet_child_params: Any = None
    input_noise: str = "deterministic"
    encode_rgb_mode: str = "duplicate"
    exclude_main_task: bool = True
    child_tap: str = "afterSelfAttn_residual"
    # decode the [K*B] latent stack in lax.map chunks of this size (0 =
    # one batched decode). The batched VAE decode's activations are the
    # HBM peak of the fused all-task step (28 latents at batch 4 is the
    # 15.75G chip's limit); chunking caps that working set so larger UNet
    # batches fit, while chunks >= 7 keep the decoder convs MXU-sized
    # (decode is FLOP-bound at ~94% of bf16 peak, so chunking costs ~0).
    decode_chunk: int = 0

    @property
    def is_multi_stream(self) -> bool:
        return self.unet_child is not None

    # ---- encoding -----------------------------------------------------

    def encode_rgb(self, rgb_norm):
        """[-1,1] NHWC image -> scaled latent mean (pipeline:607-624)."""
        return self.vae.apply(self.vae_params, rgb_norm,
                              method=AutoencoderKL.encode)

    def encode_rgb_pair(self, rgb_norm, rgb_next_norm):
        """Encode both frames in ONE batched VAE forward.

        Returns (lat [B,h,w,4], lat_next [B,h,w,4]). Single-frame fast
        path: rgb_next_norm of None — or the SAME object as rgb_norm
        (identity is value-equality for tracers too) — encodes once and
        reuses the latent, halving the encode cost (measured 53 -> 27
        ms/iter of the fused all-task step; the torch reference always
        encodes both, stablemtl_pipeline.py:607-624).
        """
        if rgb_next_norm is None or rgb_next_norm is rgb_norm:
            lat = self.encode_rgb(rgb_norm)
            return lat, lat
        both = jnp.concatenate([rgb_norm, rgb_next_norm], axis=0)
        lat = self.encode_rgb(both)
        return jnp.split(lat, 2, axis=0)

    @property
    def rgb_latent_channels(self) -> int:
        """4 in 'avg' mode (conv_in repeat=2), else 8 (repeat=3)
        (reference util/model.py:191-194)."""
        return 4 if self.encode_rgb_mode == "avg" else 8

    def rgb_latent_for_task(self, lat, lat_next, task_idx):
        """Per-task conditioning latent [B,h,w,{4|8}].

        Two-frame tasks see (lat, lat_next); single-frame tasks see the
        configured second-frame mode (pipeline:427-447): 'duplicate'
        (default), 'zero', or 'avg' (mean of the two frame latents, a
        single 4-channel group). `task_idx` may be a traced scalar or a [T]
        vector (then the output gains a leading T axis).
        """
        two_frame = jnp.asarray(TWO_FRAME_TABLE)[task_idx]
        if self.encode_rgb_mode == "avg":
            # avg mode: one 4ch group; (lat+lat_next)/2 for two-frame tasks,
            # lat itself otherwise (pipeline:443-447)
            avg = (lat + lat_next) / 2.0
            if jnp.ndim(two_frame) == 0:
                return jnp.where(two_frame, avg, lat)
            return jnp.where(two_frame[:, None, None, None, None],
                             avg[None], lat[None])
        if self.encode_rgb_mode == "duplicate":
            second = lat
        elif self.encode_rgb_mode == "zero":
            second = jnp.zeros_like(lat)
        else:
            raise ValueError(self.encode_rgb_mode)
        if jnp.ndim(two_frame) == 0:
            nxt = jnp.where(two_frame, lat_next, second)
            return jnp.concatenate([lat, nxt], axis=-1)
        nxt = jnp.where(two_frame[:, None, None, None, None],
                        lat_next[None], second[None])
        first = jnp.broadcast_to(lat[None], nxt.shape)
        return jnp.concatenate([first, nxt], axis=-1)  # [T,B,h,w,8]

    def text_embed(self, task_idx, batch_size: int):
        """[B, L, D] text conditioning for a (traced) task index."""
        emb = jnp.take(self.text_embed_table, task_idx, axis=0)
        return jnp.broadcast_to(emb[None], (batch_size,) + emb.shape)

    def noise_latent(self, lat, rng=None):
        """The third 4-channel group: zeros (deterministic) or gaussian
        (pipeline:557-562)."""
        if self.input_noise == "deterministic":
            return jnp.zeros_like(lat)
        if self.input_noise == "random":
            if rng is None:
                raise ValueError("input_noise='random' requires an rng")
            return jax.random.normal(rng, lat.shape, lat.dtype)
        raise ValueError(f"Unknown input noise: {self.input_noise}")

    # ---- child features (multi-stream) --------------------------------

    def aux_task_indices(self, main_idx):
        """[T_aux] auxiliary-task indices for a traced main task.

        With exclude_main_task the main task is removed from the canonical
        order (pipeline:483-484); implemented as a traced argsort that moves
        `main_idx` to the end, keeping ascending order otherwise.
        """
        idx = jnp.arange(N_TASKS)
        if not self.exclude_main_task:
            return idx
        order = jnp.argsort(jnp.where(idx == main_idx, N_TASKS, idx))
        return order[: N_TASKS - 1]

    # ---- shared UNet prefix (fused multi-task fast path) ----------------

    def _prefix_share_ok(self) -> bool:
        """Whether the conv_in -> first-self-attn UNet prefix can be
        computed once and shared across task streams: it is
        task-independent only when the noise group is too (deterministic
        zeros; 'random' draws fresh noise per stream), and the UNet
        topology must have an attention layer in down block 0. Env kill
        switch STABLEMTL_DISABLE_PREFIX_SHARE for A/B benchmarking —
        read at TRACE time (set before jitting; flipping it under a
        cached jit wrapper has no effect)."""
        if self.input_noise != "deterministic":
            return False
        for m in (self.unet, self.unet_child):
            if m is not None and (len(m.config.block_out_channels) < 2
                                  or m.config.layers_per_block < 1):
                return False
        from .utils.env import env_flag

        return not env_flag("STABLEMTL_DISABLE_PREFIX_SHARE")

    def _prefix_variants(self, unet, params, lat, lat_next):
        """The <=2 distinct prefix states for a given UNet: one for
        single-frame tasks (second latent = configured mode) and one for
        two-frame tasks (second latent = real next frame). Returns
        (state_single, state_two) pytrees with [B, ...] leaves; the same
        object twice when the variants collapse (single-frame input in
        'duplicate' mode)."""
        B = lat.shape[0]
        t = jnp.full((B,), FIXED_TIMESTEP, jnp.int32)
        # the prefix never reads the text conditioning; any [B,L,D] works
        text0 = jnp.zeros((B,) + self.text_embed_table.shape[1:],
                          self.text_embed_table.dtype)

        def state_for(task_idx: int):
            rgb_lat = self.rgb_latent_for_task(lat, lat_next,
                                               jnp.asarray(task_idx))
            x = jnp.concatenate(
                [rgb_lat, jnp.zeros_like(rgb_lat[..., :4])], axis=-1)
            return unet.apply(params, x, t, text0, prefix_only=True)

        single = state_for(_SINGLE_FRAME_IDX)
        # variant collapse on single-frame inputs: 'duplicate' second
        # latent == lat trivially; 'avg' gives (lat+lat)/2 == lat exactly
        # in floating point
        if lat_next is lat and self.encode_rgb_mode in ("duplicate", "avg"):
            return single, single
        return single, state_for(_TWO_FRAME_IDX)

    @staticmethod
    def _prefix_select(state_single, state_two, two_frame):
        """Per-stream prefix for a traced scalar two_frame flag."""
        if state_single is state_two:
            return state_single
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(two_frame, b, a), state_single, state_two)

    @staticmethod
    def _prefix_stack(state_single, state_two, flags):
        """[B*K, ...] prefix state for a task axis folded into batch.

        flags: per-slot two-frame indicator — python bools (static task
        set) or a traced [K] vector (traced aux subset).

        The fold is B-MAJOR (sample-major: rows b0t0, b0t1, ..., b1t0, ...)
        — load-bearing for multi-chip: the batch axis is sharded over the
        mesh's `data` axis, and only a merge whose SHARDED dim is major
        stays expressible as a sharding of the folded axis. The old
        task-major fold made the unfold reshape un-partitionable and GSPMD
        fell back to "involuntary full rematerialization" (replicate +
        re-shard) of the child taps at every task-attention layer
        (MULTICHIP_r03 warning wall)."""
        if isinstance(flags, (list, tuple)):
            parts = [state_two if bool(f) else state_single for f in flags]
        else:
            parts = [StableMTLPipeline._prefix_select(
                state_single, state_two, flags[i])
                for i in range(flags.shape[0])]
        return jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs, axis=1).reshape(
                (xs[0].shape[0] * len(xs),) + xs[0].shape[1:]), *parts)

    def create_task_feats(self, lat, lat_next, main_idx, rng=None):
        """Frozen-child features for every auxiliary task, in ONE forward.

        Returns (aux_idx [T_aux], task_feats: list of 16 arrays
        [T_aux, B, N_l, C_l]). Tasks are folded into batch for the child
        UNet (vs. the reference's 6 sequential forwards, pipeline:495-513).

        The reference's `drop_ratio` (randomly remove one aux task from the
        key set, pipeline:486-489 — 0.0 in every shipped config) is served
        here by the task-masking regularizer (-inf key bias,
        models/transformer.TaskAttentionBank._mask_bias), which is the
        shape-static formulation of the same regularization.
        """
        if not self.is_multi_stream:
            return None, None
        B = lat.shape[0]
        aux_idx = self.aux_task_indices(main_idx)
        T = aux_idx.shape[0]

        # B-MAJOR batch fold (see _prefix_stack docstring): the folded
        # child batch is ordered b0t0, b0t1, ..., so the data-sharded B
        # axis stays the major factor of the merged dim and GSPMD can
        # shard fold and unfold without rematerialization.
        text = jnp.take(self.text_embed_table, aux_idx, axis=0)  # [T,L,D]
        text = jnp.broadcast_to(text[None], (B, T) + text.shape[1:])
        text = text.reshape((B * T,) + text.shape[2:])
        t_vec = jnp.full((B * T,), FIXED_TIMESTEP, jnp.int32)
        cparams = jax.lax.stop_gradient(self.unet_child_params)

        if self._prefix_share_ok():
            # shared prefix; the aux subset is traced, so variants are
            # selected per slot (jnp.where) before the batch fold
            s1, s2 = self._prefix_variants(self.unet_child, cparams,
                                           lat, lat_next)
            flags = jnp.asarray(TWO_FRAME_TABLE)[aux_idx]
            state = self._prefix_stack(s1, s2, flags)
            _, taps = self.unet_child.apply(
                cparams, None, t_vec, text,
                tap=self.child_tap, train=False, prefix_state=state)
        else:
            rgb_lat = self.rgb_latent_for_task(lat, lat_next, aux_idx)
            noise = self.noise_latent(rgb_lat[..., :4], rng)
            x = jnp.concatenate([rgb_lat, noise], axis=-1)  # [T,B,h,w,12]
            x = jnp.swapaxes(x, 0, 1).reshape((B * T,) + x.shape[2:])
            _, taps = self.unet_child.apply(
                cparams, x, t_vec, text, tap=self.child_tap, train=False)
        feats = [jnp.swapaxes(t.reshape((B, T) + t.shape[1:]), 0, 1)
                 for t in taps]
        return aux_idx, feats

    def child_taps_all_tasks(self, lat, lat_next, rng=None):
        """Child features for ALL n_tasks in one forward: 16 x [T, B, N, C].

        The fused multi-task fast path: computed once, every main stream
        gathers its 6 auxiliary slices from this table — 7 child-equivalent
        forwards per image instead of the reference's 7x6
        (pipeline:495-513 looped per main task).
        """
        if not self.is_multi_stream:
            return None
        B = lat.shape[0]
        # B-MAJOR batch fold (see _prefix_stack docstring)
        text = jnp.broadcast_to(self.text_embed_table[None],
                                (B, N_TASKS) + self.text_embed_table.shape[1:])
        text = text.reshape((B * N_TASKS,) + text.shape[2:])
        t_vec = jnp.full((B * N_TASKS,), FIXED_TIMESTEP, jnp.int32)
        cparams = jax.lax.stop_gradient(self.unet_child_params)
        if self._prefix_share_ok():
            # the task-independent prefix (conv_in -> first self-attn) is
            # computed once per distinct input (<=2) instead of once per
            # task fold; static task set -> static variant stacking
            s1, s2 = self._prefix_variants(self.unet_child, cparams,
                                           lat, lat_next)
            state = self._prefix_stack(s1, s2, list(TWO_FRAME_TABLE))
            _, taps = self.unet_child.apply(
                cparams, None, t_vec, text,
                tap=self.child_tap, train=False, prefix_state=state)
        else:
            all_idx = jnp.arange(N_TASKS)
            rgb_lat = self.rgb_latent_for_task(lat, lat_next, all_idx)
            noise = self.noise_latent(rgb_lat[..., :4], rng)
            x = jnp.concatenate([rgb_lat, noise], axis=-1)
            x = jnp.swapaxes(x, 0, 1).reshape((B * N_TASKS,) + x.shape[2:])
            _, taps = self.unet_child.apply(
                cparams, x, t_vec, text, tap=self.child_tap, train=False)
        return [jnp.swapaxes(t.reshape((B, N_TASKS) + t.shape[1:]), 0, 1)
                for t in taps]

    # ---- inference ----------------------------------------------------

    def infer_tasks(self, rgb_norm, rgb_next_norm, task_indices, rng=None,
                    params=None):
        """Fused multi-task inference for a subset of tasks.

        task_indices: [K] int array. Returns [K, B, H, W, 3] decoded
        (clipped) maps in task_indices order. The VAE encode and the child
        taps are computed ONCE and shared; only the K main streams and K
        decodes run per requested task — a 2-task eval dataset (DIODE
        depth+normal, KITTI flow+scene-flow, MID albedo+shading) pays the
        expensive shared work once instead of per task (the reference
        re-runs the full pipeline per output_type,
        stablemtl_trainer.py:650-660).
        """
        task_indices = jnp.asarray(task_indices, jnp.int32)
        lat, lat_next = self.encode_rgb_pair(rgb_norm, rgb_next_norm)
        taps_all = self.child_taps_all_tasks(lat, lat_next, rng)
        preds = self.main_streams(lat, lat_next, taps_all, task_indices,
                                  rng=rng, params=params)  # [K, B, h, w, 4]
        flat = preds.reshape((-1,) + preds.shape[2:])
        n, c = flat.shape[0], self.decode_chunk
        if c and c < n and n % c == 0:
            imgs = jax.lax.map(self.decode_latent,
                               flat.reshape((n // c, c) + flat.shape[1:]))
            imgs = imgs.reshape((n,) + imgs.shape[2:])
        else:
            imgs = self.decode_latent(flat)
        imgs = imgs.reshape((task_indices.shape[0], lat.shape[0])
                            + imgs.shape[1:])
        return jnp.clip(imgs, -1.0, 1.0)

    def main_streams(self, lat, lat_next, taps_all, task_indices, rng=None,
                     params=None, with_task_attention: bool = True):
        """The K vmapped main-UNet streams given precomputed child taps.

        task_indices: [K] int. Returns [K, B, h, w, 4] latent predictions.

        Cross-task K/V depends only on the shared child features: the
        all-task tables are built ONCE (models/unet.task_kv_tables) and
        shared — unbatched — across the vmapped streams. Each stream
        excludes its own task from the key set with a -inf bias (exactly
        softmax-equivalent to gathering the aux subset, exp(-1e9)=0),
        so neither the K/V MLPs nor a [T_aux,...] gather run per stream.

        with_task_attention=False skips the cross-task machinery entirely
        (K/V tables, Q MLPs, per-pixel task attention) — an ablation hook
        for tools/bench_breakdown.py, not a production mode.
        """
        B = lat.shape[0]
        t = jnp.full((B,), FIXED_TIMESTEP, jnp.int32)
        uparams = params if params is not None else self.unet_params

        kv_tables = None
        if self.is_multi_stream and with_task_attention:
            from .models.unet import task_kv_tables
            kv_tables = task_kv_tables(self.unet.config, uparams, taps_all)

        share = self._prefix_share_ok()
        if share:
            # conv_in -> first-self-attn computed once per distinct input
            # (outside the vmap), selected per stream by its task's
            # two-frame flag
            s1, s2 = self._prefix_variants(self.unet, uparams, lat, lat_next)

        def one_task(main_idx):
            text = self.text_embed(main_idx, B)
            if share:
                two = jnp.asarray(TWO_FRAME_TABLE)[main_idx]
                extra = dict(prefix_state=self._prefix_select(s1, s2, two))
                x = None
            else:
                rgb_lat = self.rgb_latent_for_task(lat, lat_next, main_idx)
                # per-stream independent draws under input_noise='random'
                # (one shared key would give every task stream
                # byte-identical noise; the reference draws fresh randn
                # per forward)
                r = None if rng is None else jax.random.fold_in(rng, main_idx)
                noise = self.noise_latent(rgb_lat[..., :4], r)
                x = jnp.concatenate([rgb_lat, noise], axis=-1)
                extra = {}
            if self.is_multi_stream and with_task_attention:
                key_bias = jnp.where(
                    (jnp.arange(N_TASKS) == main_idx) & self.exclude_main_task,
                    -1e9, 0.0).astype(jnp.float32)
                pred, _ = self.unet.apply(
                    uparams, x, t, text, task_kv=kv_tables,
                    main_idx=main_idx, task_key_bias=key_bias, train=False,
                    **extra)
            else:
                pred, _ = self.unet.apply(uparams, x, t, text, train=False,
                                          **extra)
            return pred

        return jax.vmap(one_task)(task_indices)

    def infer_all_tasks(self, rgb_norm, rgb_next_norm, rng=None, params=None):
        """Fused multi-task inference: one input -> predictions for ALL
        tasks, [n_tasks, B, H, W, 3] in canonical task order (child taps
        computed once; 7 main streams vmapped through the MXU)."""
        return self.infer_tasks(rgb_norm, rgb_next_norm,
                                jnp.arange(N_TASKS), rng=rng, params=params)


    def unet_forward(self, lat, lat_next, task_idx, rng=None, params=None,
                     train: bool = False, rngs=None):
        """Main-UNet single step: conditioning latents -> x0 latent pred.

        Parity: pipeline:518-598 (`single_infer` minus the VAE decode).
        `params` overrides self.unet_params (so the trainer can differentiate
        through it).
        """
        B = lat.shape[0]
        rgb_lat = self.rgb_latent_for_task(lat, lat_next, task_idx)
        # independent draws for the main noise group and the child-feats
        # noise group (input_noise='random' only; the reference calls
        # torch.randn separately per forward, pipeline:557-562)
        r_main = None if rng is None else jax.random.fold_in(rng, 0)
        r_child = None if rng is None else jax.random.fold_in(rng, 1)
        noise = self.noise_latent(rgb_lat[..., :4], r_main)
        # concat order is load-bearing (pipeline:582-584):
        # [rgb_latent(8) | output_noise(4)]
        x = jnp.concatenate([rgb_lat, noise], axis=-1)
        text = self.text_embed(task_idx, B)

        main_idx = aux_idx = None
        task_feats = None
        if self.is_multi_stream:
            aux_idx, task_feats = self.create_task_feats(
                lat, lat_next, task_idx, r_child)
            main_idx = task_idx

        t = jnp.full((B,), FIXED_TIMESTEP, jnp.int32)
        pred, _ = self.unet.apply(
            params if params is not None else self.unet_params,
            x, t, text, task_feats=task_feats, main_idx=main_idx,
            aux_idx=aux_idx, train=train,
            rngs=rngs)
        return pred

    def decode_latent(self, latent):
        """Scaled latent -> 3-channel image in [-1,1] (clipped by callers)."""
        return self.vae.apply(self.vae_params, latent,
                              method=AutoencoderKL.decode)

    def infer(self, rgb_norm, rgb_next_norm, task_idx, rng=None):
        """Full single-step inference: images -> decoded 3ch map [-1,1].

        Task-specific channel selection (decode_3ch_to_task) is applied by
        the caller, which knows the task statically.
        """
        lat, lat_next = self.encode_rgb_pair(rgb_norm, rgb_next_norm)
        pred_latent = self.unet_forward(lat, lat_next, task_idx, rng)
        img = self.decode_latent(pred_latent)
        return jnp.clip(img, -1.0, 1.0)


# ---------------------------------------------------------------------------
# Jit wrappers (params as ARGUMENTS, never baked closure constants)
# ---------------------------------------------------------------------------

def _params_bundle(pipe: StableMTLPipeline) -> dict:
    out = {"vae": pipe.vae_params, "unet": pipe.unet_params,
           "text": pipe.text_embed_table}
    if pipe.is_multi_stream:
        out["child"] = pipe.unet_child_params
    return out


def _rebind(pipe: StableMTLPipeline, bundle: dict) -> StableMTLPipeline:
    return dataclasses.replace(
        pipe, vae_params=bundle["vae"], unet_params=bundle["unet"],
        text_embed_table=bundle["text"],
        unet_child_params=bundle.get("child"))


def put_params_on_device(pipe: StableMTLPipeline) -> StableMTLPipeline:
    """Device-put every param tree ONCE — REQUIRED before any timed jit
    loop: host-numpy params are re-shipped on EVERY jit call (~5 GB per
    call through the low-bandwidth axon tunnel; measured as 4.07 -> 0.66
    img/s of pure timing noise, BENCH_NOTES.md round 3). One helper so no
    bench tool re-invents (or forgets) the idiom."""
    return _rebind(pipe, jax.device_put(_params_bundle(pipe)))


def jit_infer_all_tasks(pipe: StableMTLPipeline):
    """Jitted fused multi-task inference; parameters are traced arguments
    (a closure would bake ~GBs of weights into the HLO as constants)."""
    bundle = _params_bundle(pipe)

    @jax.jit
    def fn(b, rgb, rgb_next):
        return _rebind(pipe, b).infer_all_tasks(rgb, rgb_next)

    def wrapped(rgb, rgb_next):
        return fn(bundle, rgb, rgb_next)

    wrapped.jitted = fn
    wrapped.bundle = bundle
    return wrapped


def jit_infer_tasks(pipe: StableMTLPipeline):
    """Jitted subset multi-task inference: (rgb, rgb_next, task_indices[K])
    -> [K, B, H, W, 3]. One executable per (K, geometry); the indices are
    data, so different task subsets of the same size reuse the compile."""
    bundle = _params_bundle(pipe)

    @jax.jit
    def fn(b, rgb, rgb_next, task_indices):
        return _rebind(pipe, b).infer_tasks(rgb, rgb_next, task_indices)

    def wrapped(rgb, rgb_next, task_indices):
        return fn(bundle, rgb, rgb_next, jnp.asarray(task_indices,
                                                     jnp.int32))

    wrapped.jitted = fn
    wrapped.bundle = bundle
    return wrapped


def jit_infer(pipe: StableMTLPipeline):
    """Jitted single-task inference (task index is data)."""
    bundle = _params_bundle(pipe)

    @jax.jit
    def fn(b, rgb, rgb_next, task_idx):
        return _rebind(pipe, b).infer(rgb, rgb_next, task_idx)

    def wrapped(rgb, rgb_next, task_idx):
        return fn(bundle, rgb, rgb_next, task_idx)

    wrapped.jitted = fn
    return wrapped


# ---------------------------------------------------------------------------
# Setup helpers
# ---------------------------------------------------------------------------

def build_text_embed_table(clip_model: CLIPTextModel, clip_params,
                           tokenizer=None, prompts: Sequence[str] = TASK_PROMPTS):
    """Embed the task prompts once -> [n_tasks, L, D] table.

    Replaces the per-call CLIP forward of the reference (pipeline:464-473).
    """
    from .models.clip import get_tokenizer, tokenize_batch

    if tokenizer is None:
        tokenizer = get_tokenizer()
    ids = tokenize_batch(tokenizer, list(prompts))
    return clip_model.apply(clip_params, jnp.asarray(ids))
