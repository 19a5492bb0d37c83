"""Frame-level data parallelism (SURVEY.md §2.4, BASELINE config #5).

Two properties on the virtual 8-device CPU mesh (conftest.py):
  1. a dp-sharded train step executes and keeps the batch sharded on `dp`;
  2. EQUIVALENCE — the sharded step computes the same parameter update as the
     identical step on the same global batch without a mesh (the gradient-psum
     XLA inserts must reproduce the unsharded global-mean gradients).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianavatar_tpu.parallel import DATA_AXIS, make_mesh, replicate, shard_batch

import __graft_entry__ as graft


def _build(batch_size):
    from gaussianavatar_tpu.engine.train_step import make_train_step

    net, model, assets, tx, opt, H, W, raster_cfg, state, batch = graft._build_tiny(
        query_res=32, image_hw=32, n_frames=batch_size, batch_size=batch_size
    )
    step = make_train_step(
        net, model, assets, tx, opt, H, W, (1.0, 1.0, 1.0), raster_cfg, train_stage=1
    )
    return step, state, batch


def _copy(tree):
    return jax.tree.map(jnp.array, tree)


def test_frame_dp_step_runs_sharded():
    step, state, batch = _build(batch_size=8)
    mesh = make_mesh(8)
    state = replicate(state, mesh)
    sbatch = shard_batch(batch, mesh)

    new_state, terms, images = step(
        state, sbatch, jnp.float32(10.0), jnp.float32(1.0), jnp.float32(0.0)
    )
    jax.block_until_ready(new_state.params)
    assert np.isfinite(float(terms["total"]))
    assert images.shape[0] == 8
    # the output images must still be sharded along dp (no silent gather)
    assert DATA_AXIS in str(images.sharding.spec)
    assert int(new_state.iteration) == 1


def test_frame_dp_matches_unsharded_step():
    """Gradient-psum equivalence. Uses SGD so the parameter delta IS the
    gradient (times -lr): Adam's eps-knee normalization turns few-ulp
    reduction-order noise on near-zero grads into O(lr) update differences,
    which would test the optimizer's conditioning, not the sharding."""
    import optax

    from gaussianavatar_tpu.engine.train_step import make_train_step

    net, model, assets, _, opt, H, W, raster_cfg, state, batch = graft._build_tiny(
        query_res=32, image_hw=32, n_frames=8, batch_size=8
    )
    tx = optax.sgd(1.0)  # param delta == -gradient
    state = state.replace(opt_state=tx.init(state.params))
    step = make_train_step(
        net, model, assets, tx, opt, H, W, (1.0, 1.0, 1.0), raster_cfg, train_stage=1
    )
    mesh = make_mesh(8)

    # donate_argnums=0 consumes the state: run from two independent copies
    ref_state, ref_terms, _ = step(
        _copy(state), batch, jnp.float32(10.0), jnp.float32(1.0), jnp.float32(0.0)
    )
    dp_state, dp_terms, _ = step(
        replicate(_copy(state), mesh),
        shard_batch(batch, mesh),
        jnp.float32(10.0),
        jnp.float32(1.0),
        jnp.float32(0.0),
    )
    np.testing.assert_allclose(
        float(dp_terms["total"]), float(ref_terms["total"]), atol=1e-6, rtol=1e-6
    )

    ref = jax.tree.map(np.asarray, ref_state.params)
    got = jax.tree.map(np.asarray, dp_state.params)
    flat_ref, _ = jax.tree.flatten(ref)
    flat_got, _ = jax.tree.flatten(got)
    assert len(flat_ref) == len(flat_got)
    for r, g in zip(flat_ref, flat_got):
        np.testing.assert_allclose(g, r, atol=1e-5, rtol=1e-5)


def test_frame_dp_batch_stats_match():
    """BatchNorm running stats must also see the GLOBAL batch statistics when
    sharded (XLA's cross-device mean), not per-shard ones."""
    step, state, batch = _build(batch_size=8)
    mesh = make_mesh(8)

    ref_state, _, _ = step(
        _copy(state), batch, jnp.float32(10.0), jnp.float32(1.0), jnp.float32(0.0)
    )
    dp_state, _, _ = step(
        replicate(_copy(state), mesh),
        shard_batch(batch, mesh),
        jnp.float32(10.0),
        jnp.float32(1.0),
        jnp.float32(0.0),
    )
    flat_ref, _ = jax.tree.flatten(jax.tree.map(np.asarray, ref_state.batch_stats))
    flat_got, _ = jax.tree.flatten(jax.tree.map(np.asarray, dp_state.batch_stats))
    for r, g in zip(flat_ref, flat_got):
        np.testing.assert_allclose(g, r, atol=1e-5, rtol=1e-5)


def test_frame_dp_ragged_matches_unsharded_step():
    """The ragged rasterizer under dp: per-tile caps ride the sharded feed
    and the sharded step must reproduce the unsharded parameter update
    (same SGD-delta construction as the cascade equivalence test)."""
    import optax

    from gaussianavatar_tpu.engine.train_step import make_train_step

    net, model, assets, _, opt, H, W, raster_cfg, state, batch = graft._build_tiny(
        query_res=32, image_hw=32, n_frames=8, batch_size=8
    )
    raster_cfg = raster_cfg._replace(ragged=True, ragged_chunk=16,
                                     backend="pallas_interpret")
    ts = raster_cfg.tile_size
    T = (-(-H // ts)) * (-(-W // ts))
    rng = np.random.default_rng(0)
    batch = dict(batch, tile_caps=rng.integers(
        0, 64, size=(8, T)).astype(np.int32))

    tx = optax.sgd(1.0)
    state = state.replace(opt_state=tx.init(state.params))
    step = make_train_step(
        net, model, assets, tx, opt, H, W, (1.0, 1.0, 1.0), raster_cfg,
        train_stage=1,
    )
    mesh = make_mesh(8)

    ref_state, ref_terms, _ = step(
        _copy(state), batch, jnp.float32(10.0), jnp.float32(1.0), jnp.float32(0.0)
    )
    dp_state, dp_terms, _ = step(
        replicate(_copy(state), mesh),
        shard_batch(batch, mesh),
        jnp.float32(10.0),
        jnp.float32(1.0),
        jnp.float32(0.0),
    )
    np.testing.assert_allclose(
        float(dp_terms["total"]), float(ref_terms["total"]), atol=1e-6, rtol=1e-6
    )
    assert float(ref_terms["raster_overflow"]) == float(dp_terms["raster_overflow"])
    flat_ref, _ = jax.tree.flatten(jax.tree.map(np.asarray, ref_state.params))
    flat_got, _ = jax.tree.flatten(jax.tree.map(np.asarray, dp_state.params))
    for r, g in zip(flat_ref, flat_got):
        np.testing.assert_allclose(g, r, atol=1e-5, rtol=1e-5)


def test_frame_dp_ragged_vec_matches_unsharded_step():
    """blend_vec=1 under dp: the vectorized kernels' (1, PX) pixel blocks and
    scan-based chunk math must compose with the sharded feed exactly like the
    sequential kernels do."""
    import optax

    from gaussianavatar_tpu.engine.train_step import make_train_step

    net, model, assets, _, opt, H, W, raster_cfg, state, batch = graft._build_tiny(
        query_res=32, image_hw=32, n_frames=8, batch_size=8
    )
    raster_cfg = raster_cfg._replace(ragged=True, ragged_chunk=16,
                                     blend_vec=True,
                                     backend="pallas_interpret")
    ts = raster_cfg.tile_size
    T = (-(-H // ts)) * (-(-W // ts))
    rng = np.random.default_rng(1)
    batch = dict(batch, tile_caps=rng.integers(
        0, 64, size=(8, T)).astype(np.int32))

    tx = optax.sgd(1.0)
    state = state.replace(opt_state=tx.init(state.params))
    step = make_train_step(
        net, model, assets, tx, opt, H, W, (1.0, 1.0, 1.0), raster_cfg,
        train_stage=1,
    )
    mesh = make_mesh(8)

    ref_state, ref_terms, _ = step(
        _copy(state), batch, jnp.float32(10.0), jnp.float32(1.0), jnp.float32(0.0)
    )
    dp_state, dp_terms, _ = step(
        replicate(_copy(state), mesh),
        shard_batch(batch, mesh),
        jnp.float32(10.0),
        jnp.float32(1.0),
        jnp.float32(0.0),
    )
    np.testing.assert_allclose(
        float(dp_terms["total"]), float(ref_terms["total"]), atol=1e-6, rtol=1e-6
    )
    assert float(ref_terms["raster_overflow"]) == float(dp_terms["raster_overflow"])
    flat_ref, _ = jax.tree.flatten(jax.tree.map(np.asarray, ref_state.params))
    flat_got, _ = jax.tree.flatten(jax.tree.map(np.asarray, dp_state.params))
    for r, g in zip(flat_ref, flat_got):
        np.testing.assert_allclose(g, r, atol=1e-5, rtol=1e-5)
