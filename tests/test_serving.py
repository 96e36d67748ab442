"""Serving subsystem: AOT export round-trip + micro-batching session.

New capability vs the reference (its closest surface is the batch-1
validation loop, stablemtl_trainer.py:641); see stablemtl_tpu/serving.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stablemtl_tpu.pipeline import (N_TASKS, _params_bundle, _rebind,
                                    jit_infer_all_tasks)
from stablemtl_tpu.serving import (ServingSession, export_pipeline,
                                   load_exported)

from test_pipeline import _tiny_pipeline


@pytest.fixture(scope="module")
def pipe():
    return _tiny_pipeline(multi_stream=True)


def test_export_roundtrip_matches_jit(pipe, tmp_path):
    B, H, W = 2, 16, 16
    rgb = np.random.RandomState(0).uniform(-1, 1, (B, H, W, 3)).astype(
        np.float32)

    path = tmp_path / "all_tasks.stablehlo"
    blob = export_pipeline(pipe, batch=B, res_hw=(H, W), path=str(path))
    assert path.read_bytes() == blob
    assert len(blob) < 2_000_000  # params are args, not baked constants

    exported = load_exported(str(path))
    bundle = _params_bundle(pipe)
    got = np.asarray(exported.call(bundle, jnp.asarray(rgb)))
    want = np.asarray(jit_infer_all_tasks(pipe)(jnp.asarray(rgb), None))
    assert got.shape == (N_TASKS, B, H, W, 3)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_export_pair_path(pipe):
    B, H, W = 1, 16, 16
    rng = np.random.RandomState(1)
    rgb = rng.uniform(-1, 1, (B, H, W, 3)).astype(np.float32)
    nxt = rng.uniform(-1, 1, (B, H, W, 3)).astype(np.float32)

    blob = export_pipeline(pipe, batch=B, res_hw=(H, W), pair=True)
    exported = load_exported(blob)
    bundle = _params_bundle(pipe)
    got = np.asarray(exported.call(bundle, jnp.asarray(rgb),
                                   jnp.asarray(nxt)))

    @jax.jit
    def ref(b, r, rn):
        return _rebind(pipe, b).infer_all_tasks(r, rn)

    want = np.asarray(ref(bundle, jnp.asarray(rgb), jnp.asarray(nxt)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_session_batches_and_unpads(pipe):
    H, W = 16, 16
    rng = np.random.RandomState(2)
    imgs = [rng.uniform(-1, 1, (H, W, 3)).astype(np.float32)
            for _ in range(3)]

    # Direct reference outputs AT THE SESSION'S COMPILED BATCH (2): XLA
    # compiles per shape, and on a random-init model the shape-dependent
    # fusion rounding amplifies chaotically through the UNet stack (a
    # batch-1 executable legitimately differs by O(1) from a batch-2 one;
    # measured). Each image's expectation is computed with ITSELF as the
    # batch mate, which matches ANY grouping the collector lands on —
    # per-sample outputs are bit-independent of batch mates
    # (test_batch_permutation_equivariance asserts exactly that), so the
    # comparison doesn't depend on timing-sensitive group boundaries.
    direct = jit_infer_all_tasks(pipe)
    want = [np.asarray(direct(jnp.asarray(np.stack([im] * 2)), None))[:, 0]
            for im in imgs]

    with ServingSession(pipe, batch=2, max_delay_s=0.05) as sess:
        futs = [sess.submit(im) for im in imgs]  # 3 requests, batch 2:
        got = [f.result(timeout=300) for f in futs]  # one full + one padded

    for g, w in zip(got, want):
        assert g.shape == (N_TASKS, H, W, 3)
        np.testing.assert_array_equal(g, w)  # same executable -> bit-equal


def test_batch_permutation_equivariance(pipe):
    """One compiled executable must not mix batch elements: swapping the
    two inputs swaps the two outputs BIT-EXACTLY, and a sample's output is
    bit-independent of its batch MATE (per-sample math is batch-parallel;
    any cross-batch reduction would break both). The mate-independence
    half is what lets the session tests compare against any grouping."""
    fn = jit_infer_all_tasks(pipe)
    rng = np.random.RandomState(4)
    a, b, c = [rng.uniform(-1, 1, (16, 16, 3)).astype(np.float32)
               for _ in range(3)]
    o_ab = np.asarray(fn(jnp.asarray(np.stack([a, b])), None))
    o_ba = np.asarray(fn(jnp.asarray(np.stack([b, a])), None))
    np.testing.assert_array_equal(o_ab[:, 0], o_ba[:, 1])
    np.testing.assert_array_equal(o_ab[:, 1], o_ba[:, 0])
    o_ac = np.asarray(fn(jnp.asarray(np.stack([a, c])), None))
    np.testing.assert_array_equal(o_ab[:, 0], o_ac[:, 0])  # mate-independent


def test_session_rejects_bad_requests(pipe):
    with ServingSession(pipe, batch=2, max_delay_s=0.0) as sess:
        sess.warmup((16, 16))
        with pytest.raises(ValueError, match="geometry"):
            sess.submit(np.zeros((8, 8, 3), np.float32))
        with pytest.raises(ValueError, match=r"\[H, W, 3\]"):
            sess.submit(np.zeros((16, 16), np.float32))
        with pytest.raises(ValueError, match="rgb_next"):
            sess.submit(np.zeros((16, 16, 3), np.float32),
                        np.zeros((16, 16, 3), np.float32))
    with pytest.raises(RuntimeError, match="closed"):
        sess.submit(np.zeros((16, 16, 3), np.float32))


def test_session_on_mesh(pipe):
    """Multi-chip serving: batch sharded over the data axis of a 2-device
    mesh (8 virtual CPU devices in conftest), outputs equal the
    single-device path."""
    from stablemtl_tpu.parallel.mesh import host_local_mesh

    H, W = 16, 16
    rng = np.random.RandomState(3)
    imgs = [rng.uniform(-1, 1, (H, W, 3)).astype(np.float32)
            for _ in range(2)]

    mesh = host_local_mesh(2)
    # reference outputs from the SAME sharded program (a differently
    # partitioned executable legitimately differs by amplified rounding on
    # a random-init model); each image paired with itself as the mate so
    # the expectation matches any collector grouping (mate-independence,
    # asserted in test_batch_permutation_equivariance)
    from stablemtl_tpu.parallel.mesh import (batch_sharding,
                                             replicated_sharding)
    from stablemtl_tpu.pipeline import _rebind

    bundle = jax.device_put(_params_bundle(pipe), replicated_sharding(mesh))
    direct = jax.jit(lambda b, r: _rebind(pipe, b).infer_all_tasks(r, None))
    want = [np.asarray(direct(bundle, jax.device_put(
        np.stack([im] * 2), batch_sharding(mesh))))[:, 0] for im in imgs]
    with pytest.raises(ValueError, match="divisible"):
        ServingSession(pipe, batch=3, mesh=mesh).close()
    with ServingSession(pipe, batch=2, max_delay_s=0.05,
                        mesh=mesh) as sess:
        futs = [sess.submit(im) for im in imgs]
        got = [f.result(timeout=300) for f in futs]
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)  # same program -> bit-equal


def test_export_on_mesh_roundtrip(pipe, tmp_path):
    """Multi-chip artifact: exported with mesh shardings (nr_devices=2),
    deserialized and called with mesh-placed inputs, bit-equal to the
    directly-jitted sharded step."""
    from stablemtl_tpu.parallel.mesh import (batch_sharding,
                                             host_local_mesh,
                                             replicated_sharding)
    from stablemtl_tpu.pipeline import _rebind

    mesh = host_local_mesh(2)
    B, H, W = 2, 16, 16
    blob = export_pipeline(pipe, batch=B, res_hw=(H, W), mesh=mesh)
    exported = load_exported(blob)
    assert exported.nr_devices == 2

    rep, bsh = replicated_sharding(mesh), batch_sharding(mesh)
    bundle = jax.device_put(_params_bundle(pipe), rep)
    x = jax.device_put(
        np.random.RandomState(5).uniform(-1, 1, (B, H, W, 3))
        .astype(np.float32), bsh)
    got = np.asarray(exported.call(bundle, x))
    want = np.asarray(jax.jit(
        lambda b, r: _rebind(pipe, b).infer_all_tasks(r, None))(bundle, x))
    np.testing.assert_array_equal(got, want)


def test_cast_params_for_inference(pipe):
    """bf16 inference cast: matrix/conv leaves cast, vectors stay f32,
    outputs stay within the bf16 envelope of the f32 pipeline."""
    from stablemtl_tpu.serving import cast_params_for_inference

    cast = cast_params_for_inference(pipe)
    leaves = jax.tree_util.tree_leaves(cast.unet_params)
    assert all(l.dtype == (jnp.bfloat16 if l.ndim >= 2 else l.dtype)
               for l in leaves)
    assert any(l.ndim < 2 and l.dtype == jnp.float32 for l in leaves)

    rgb = jnp.asarray(np.random.RandomState(6)
                      .uniform(-1, 1, (1, 16, 16, 3)), jnp.float32)
    a = np.asarray(jit_infer_all_tasks(pipe)(rgb, None))
    b = np.asarray(jit_infer_all_tasks(cast)(rgb, None))
    # decoded outputs live in [-1,1]; bf16 params shift them by O(1e-2)
    # on this random-init tiny model (same envelope as BENCH_NOTES's
    # measured bf16 floor)
    assert np.abs(a - b).max() < 0.2
