"""stablemtl_tpu — a TPU-native (JAX/XLA/Pallas/pjit) multi-task dense-prediction framework.

A from-scratch rebuild of the capabilities of astra-vision/StableMTL
("Repurposing Latent Diffusion Models for Multi-Task Learning from Partially
Annotated Synthetic Datasets", arXiv 2506.08013): a deterministic single-step
latent-space regressor over Stable Diffusion 2, covering 7 dense tasks
(depth, normals, semantics, optical flow, scene flow, albedo, shading) in
single-stream (task-token) and multi-stream (cross-task attention) variants.

Design is TPU-first: NHWC layouts, bf16 matmul paths onto the MXU, a single
data/model mesh with pjit/shard_map sharding, Pallas flash attention, and a
functional Flax parameterization (no module surgery — task-parameter banks are
first-class stacked pytrees vmapped over the task axis).
"""

__version__ = "0.1.0"

TASKS = (
    "normal",
    "depth",
    "semantic",
    "optical_flow",
    "scene_flow",
    "albedo",
    "shading",
)

# Tasks that consume a second (next) frame. Mirrors reference
# src/stablemtl_pipeline.py:433.
TWO_FRAME_TASKS = ("optical_flow", "scene_flow")

LATENT_SCALE_FACTOR = 0.18215  # reference src/stablemtl_pipeline.py:134-135
FIXED_TIMESTEP = 999  # single-step inference "like in lotus" (pipeline:552)


def __getattr__(name):
    """Lazy top-level API (keeps bare `import stablemtl_tpu` jax-free)."""
    _lazy = {
        "StableMTLPipeline": ("stablemtl_tpu.pipeline", "StableMTLPipeline"),
        "Predictor": ("stablemtl_tpu.predict", "Predictor"),
        "StableMTLTrainer": ("stablemtl_tpu.trainer", "StableMTLTrainer"),
        "TrainerConfig": ("stablemtl_tpu.trainer", "TrainerConfig"),
        "CheckpointManager": ("stablemtl_tpu.checkpoint",
                              "CheckpointManager"),
        "Evaluator": ("stablemtl_tpu.evaluation", "Evaluator"),
        "build_pipeline": ("stablemtl_tpu.factory", "build_pipeline"),
        "recursive_load_config": ("stablemtl_tpu.config",
                                  "recursive_load_config"),
    }
    if name in _lazy:
        import importlib

        mod, attr = _lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
