"""Production serving: AOT model export + a micro-batching session.

The reference has no serving surface — its closest thing is the batch-1
validation loop (reference stablemtl_trainer.py:641). A production
deployment needs two things the training stack doesn't give:

1. **A portable ahead-of-time artifact.** `export_pipeline` serializes the
   jitted fused multi-task step to StableHLO via `jax.export` with the
   parameters as *arguments* (the artifact stays KBs; weights keep living
   in the orbax checkpoint). A serving process deserializes it and calls
   it without importing any model code — the TPU-native equivalent of a
   TorchScript/ONNX export.

2. **Fixed-shape micro-batching.** XLA executables have static shapes, so
   a sparse request stream must be packed into the compiled batch.
   `ServingSession` runs a background collector thread that groups up to
   `batch` same-geometry requests (waiting at most `max_delay_s` after the
   first), pads the tail by repeating the last image, runs ONE fused
   all-task step, and resolves per-request futures with their unpadded
   [n_tasks, H, W, 3] outputs.

Both paths reuse the params-as-arguments jit contract (pipeline.py:448-476)
so no weight bytes are ever baked into an executable or artifact.

NOTE (this dev environment only): ServingSession fetches full decoded
images to the host — do NOT drive it over the low-bandwidth axon stdio
tunnel (CLAUDE.md: a single 21 MB device_get once wedged the remote for
~2 h). Verify on CPU; deploy on directly-attached TPUs.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .pipeline import StableMTLPipeline, _params_bundle, _rebind

# Pallas kernels lower to the `tpu_custom_call` target, which jax.export
# does not treat as guaranteed-stable; serving artifacts are rebuilt per
# release alongside the checkpoint, so pinning the runtime version is the
# deployment contract and the check is safe to disable for this target.
_TPU_CUSTOM_CALLS = ("tpu_custom_call", "Sharding")


def cast_params_for_inference(pipe: StableMTLPipeline,
                              dtype=jnp.bfloat16) -> StableMTLPipeline:
    """Cast the big matmul/conv weights (ndim >= 2) to the compute dtype,
    keeping normalization vectors f32. Training must NOT do this (f32
    master weights); for inference it halves the parameter HBM reads —
    the model already computes in bf16, so f32 params only add cast+read
    cost (bench.py measured with exactly this cast). Returns a new
    pipeline; the original params are unreferenced by it."""
    import dataclasses

    def cast(p):
        return p.astype(dtype) if getattr(p, "ndim", 0) >= 2 else p

    def tmap(tree):
        return None if tree is None else jax.tree_util.tree_map(cast, tree)

    return dataclasses.replace(
        pipe, vae_params=tmap(pipe.vae_params),
        unet_params=tmap(pipe.unet_params),
        unet_child_params=tmap(pipe.unet_child_params))


def _step_fn(pipe: StableMTLPipeline, pair: bool):
    # Strip the param trees from the closed-over pipeline: _rebind
    # replaces them from the bundle argument anyway, and a long-lived
    # closure (ServingSession keeps this fn for its lifetime) would
    # otherwise pin a second, host-side copy of multi-GB weights.
    import dataclasses

    pipe = dataclasses.replace(pipe, vae_params=None, unet_params=None,
                               unet_child_params=None,
                               text_embed_table=None)
    if pair:
        def fn(bundle, rgb, rgb_next):
            return _rebind(pipe, bundle).infer_all_tasks(rgb, rgb_next)
    else:
        # single-frame fast path: one VAE encode (pipeline.encode_rgb_pair)
        def fn(bundle, rgb):
            return _rebind(pipe, bundle).infer_all_tasks(rgb, None)
    return fn


def _specs_of(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        tree)


def export_pipeline(pipe: StableMTLPipeline, batch: int, res_hw,
                    pair: bool = False,
                    platforms: Optional[Sequence[str]] = None,
                    path: Optional[str] = None, mesh=None) -> bytes:
    """Export the fused all-task inference step as a serialized artifact.

    Returns the serialized bytes (and writes them to `path` if given).
    The exported callable takes (params_bundle, rgb[, rgb_next]) with
    rgb shaped [batch, H, W, 3] float32 in [-1, 1] and returns
    [n_tasks, batch, H, W, 3].

    With `mesh`, the artifact is a MULTI-CHIP program (params replicated,
    batch sharded over the mesh `data` axis; `Exported.nr_devices` =
    mesh size). Call it with inputs placed on an identically-shaped mesh
    (proven bit-equal to the directly-jitted sharded step on the virtual
    CPU mesh, tests/test_serving.py).
    """
    from jax import export as jexport

    H, W = res_hw
    fn = _step_fn(pipe, pair)
    bundle_spec = _specs_of(_params_bundle(pipe))
    img_spec = jax.ShapeDtypeStruct((batch, H, W, 3), jnp.float32)
    args = (bundle_spec, img_spec) + ((img_spec,) if pair else ())

    jit_kwargs = {}
    if mesh is not None:
        from .parallel.mesh import batch_sharding, replicated_sharding

        rep = replicated_sharding(mesh)
        bsh = batch_sharding(mesh)
        in_shardings = (jax.tree_util.tree_map(lambda _: rep, bundle_spec),
                        bsh) + ((bsh,) if pair else ())
        jit_kwargs["in_shardings"] = in_shardings

    disabled = tuple(jexport.DisabledSafetyCheck.custom_call(t)
                     for t in _TPU_CUSTOM_CALLS)
    exported = jexport.export(jax.jit(fn, **jit_kwargs),
                              platforms=platforms,
                              disabled_checks=disabled)(*args)
    blob = bytes(exported.serialize())
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_exported(path_or_bytes):
    """Deserialize an exported artifact -> callable
    (params_bundle, rgb[, rgb_next]) -> [n_tasks, batch, H, W, 3].

    The returned object is `jax.export.Exported`; invoke via `.call(...)`
    (re-traceable under jit, so it can be further composed/sharded).
    """
    from jax import export as jexport

    if isinstance(path_or_bytes, (bytes, bytearray)):
        blob = path_or_bytes
    else:
        with open(path_or_bytes, "rb") as f:
            blob = f.read()
    return jexport.deserialize(bytearray(blob))


class ServingSession:
    """Thread-safe micro-batching wrapper around the fused all-task step.

    One compiled executable at a fixed (batch, H, W); requests are single
    images [H, W, 3] (normalized to [-1, 1]) submitted from any thread.
    A collector thread packs up to `batch` requests per device step,
    waiting at most `max_delay_s` after the first request of a group
    (0 = never wait: each group is whatever is already queued), and
    pads partial groups by repeating the last image (padding rows are
    computed but their outputs dropped — with an 8-image executable a
    1-image batch costs the same device time, so the delay knob trades
    latency for goodput under load).
    """

    def __init__(self, pipe: StableMTLPipeline, batch: int = 8,
                 max_delay_s: float = 0.005, pair: bool = False,
                 mesh=None):
        self.batch = int(batch)
        self.pair = bool(pair)
        self.max_delay_s = float(max_delay_s)
        self._fn = jax.jit(_step_fn(pipe, pair))
        self._in_sharding = None
        if mesh is not None:
            # multi-chip serving: params replicated, the compiled batch
            # sharded over the mesh `data` axis (GSPMD propagates from the
            # input shardings; same policy as parallel/sharded_train.py)
            from .parallel.mesh import (DATA_AXIS, batch_sharding,
                                        replicated_sharding)
            n_data = mesh.shape[DATA_AXIS]
            if self.batch % n_data:
                raise ValueError(
                    f"batch {self.batch} not divisible by the mesh data "
                    f"axis ({n_data})")
            self._in_sharding = batch_sharding(mesh)
            self._bundle = jax.device_put(_params_bundle(pipe),
                                          replicated_sharding(mesh))
        else:
            self._bundle = jax.device_put(_params_bundle(pipe))
        self._queue: queue.Queue = queue.Queue()
        self._closed = False
        self._geometry = None  # (H, W), pinned by the first request
        # one lock serializes the closed-check/enqueue and the first-request
        # geometry pinning: without it a submit racing close() could land
        # behind the shutdown sentinel (future never resolves), and two
        # concurrent first submits with different shapes could both pass
        # validation (the worker's np.stack would then kill the batch)
        self._submit_lock = threading.Lock()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    # -- client side --------------------------------------------------------
    def submit(self, rgb_norm: np.ndarray,
               rgb_next_norm: Optional[np.ndarray] = None) -> Future:
        """Enqueue one image; resolves to np.ndarray [n_tasks, H, W, 3]."""
        rgb_norm = np.asarray(rgb_norm, np.float32)
        if rgb_norm.ndim != 3 or rgb_norm.shape[-1] != 3:
            raise ValueError(f"expected [H, W, 3] image, got "
                             f"{rgb_norm.shape}")
        if self.pair:
            if rgb_next_norm is None:
                raise ValueError("pair=True session needs rgb_next_norm")
            rgb_next_norm = np.asarray(rgb_next_norm, np.float32)
            if rgb_next_norm.shape != rgb_norm.shape:
                raise ValueError("rgb and rgb_next shapes differ")
        elif rgb_next_norm is not None:
            raise ValueError("pair=False session got rgb_next_norm")
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("ServingSession is closed")
            if self._geometry is None:
                self._geometry = rgb_norm.shape[:2]
            if rgb_norm.shape[:2] != self._geometry:
                raise ValueError(
                    f"geometry {rgb_norm.shape[:2]} != session geometry "
                    f"{self._geometry}; one executable serves one shape — "
                    f"resize upstream (predict.Predictor does) or open a "
                    f"second session")
            fut: Future = Future()
            self._queue.put((rgb_norm, rgb_next_norm, fut))
        return fut

    def infer(self, rgb_norm: np.ndarray,
              rgb_next_norm: Optional[np.ndarray] = None) -> np.ndarray:
        """Synchronous convenience: submit and wait."""
        return self.submit(rgb_norm, rgb_next_norm).result()

    def warmup(self, res_hw) -> None:
        """Compile the executable before traffic arrives."""
        H, W = res_hw
        z = np.zeros((H, W, 3), np.float32)
        self.infer(z, z if self.pair else None)

    def close(self) -> None:
        with self._submit_lock:
            if self._closed:
                return
            self._closed = True
            self._queue.put(None)  # wake the collector (after all submits)
        self._thread.join(timeout=60)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- device side --------------------------------------------------------
    def _collect(self):
        """Block for the first request, then drain up to `batch` within
        max_delay_s (0 = don't wait: run immediately with what's queued).
        Returns a list of (rgb, rgb_next, future) or None on shutdown."""
        first = self._queue.get()
        if first is None:
            return None
        group = [first]
        import time as _time
        t_end = _time.monotonic() + max(0.0, self.max_delay_s)
        while len(group) < self.batch:
            try:
                item = self._queue.get(
                    timeout=max(0.0, t_end - _time.monotonic()))
            except queue.Empty:
                break
            if item is None:
                self._queue.put(None)  # preserve shutdown for next loop
                break
            group.append(item)
        return group

    def _worker(self):
        while True:
            group = self._collect()
            if group is None:
                return
            n = len(group)

            def put(stack):
                x = np.stack(stack)
                return (jnp.asarray(x) if self._in_sharding is None
                        else jax.device_put(x, self._in_sharding))

            # everything touching batch assembly, host->device transfer,
            # compile and execution stays inside the try: an escaped
            # exception would kill this thread and leave every future —
            # this group's and all later ones — unresolved forever
            try:
                rgbs = [g[0] for g in group]
                rgbs += [rgbs[-1]] * (self.batch - n)  # pad: repeat last
                args = (self._bundle, put(rgbs))
                if self.pair:
                    nxts = [g[1] for g in group]
                    nxts += [nxts[-1]] * (self.batch - n)
                    args += (put(nxts),)
                out = np.asarray(self._fn(*args))  # [T, batch, H, W, 3]
            except Exception as e:  # stack/transfer/compile/OOM failures
                for _, _, fut in group:
                    if not fut.cancelled():
                        fut.set_exception(e)
                continue
            for i, (_, _, fut) in enumerate(group):
                if not fut.cancelled():
                    # copy, not view: a view would pin the whole
                    # [T, batch, H, W, 3] buffer for as long as any one
                    # client keeps its result
                    fut.set_result(out[:, i].copy())
