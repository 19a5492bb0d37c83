import jax.numpy as jnp
import numpy as np

from gaussianavatar_tpu.ops.local_frames import (
    gen_lbs_weight_from_ori,
    gen_transf_mtx_from_vtransf,
    gen_transf_mtx_full_uv,
)


def test_full_uv_frames_columns():
    rng = np.random.default_rng(0)
    verts = jnp.asarray(rng.normal(size=(1, 10, 3)).astype(np.float32))
    faces = jnp.asarray(rng.integers(0, 10, size=(4, 4, 3)))
    M = gen_transf_mtx_full_uv(verts, faces)
    assert M.shape == (1, 4, 4, 3, 3)
    tris = np.asarray(verts)[0][np.asarray(faces)]
    uu = tris[..., 1, :] - tris[..., 0, :]
    np.testing.assert_allclose(np.asarray(M[0, ..., 0]), uu, atol=1e-5)
    # third column is parallel to the triangle normal
    n = np.cross(uu, tris[..., 2, :] - tris[..., 0, :])
    ww = np.asarray(M[0, ..., 2])
    cross = np.cross(n, ww)
    np.testing.assert_allclose(cross, 0, atol=1e-4)


def test_vtransf_interpolation_identity():
    rng = np.random.default_rng(1)
    V = 8
    vtransf = jnp.broadcast_to(jnp.eye(3), (2, V, 3, 3))
    faces = jnp.asarray(rng.integers(0, V, size=(3, 3, 3)))
    bary = rng.uniform(size=(3, 3, 3)).astype(np.float32)
    bary /= bary.sum(-1, keepdims=True)
    out = gen_transf_mtx_from_vtransf(vtransf, jnp.asarray(bary), faces, scaling=2.0)
    np.testing.assert_allclose(np.asarray(out), np.broadcast_to(2 * np.eye(3), out.shape), atol=1e-5)


def test_lbs_weight_interp_matches_uv_raster():
    from gaussianavatar_tpu.ops.uv_raster import bary_interpolate, rasterize_uv_atlas
    from gaussianavatar_tpu.utils.synthetic import synthetic_body

    model, uv = synthetic_body()
    r = rasterize_uv_atlas(uv.verts, uv.uvs, uv.faces_v, uv.faces_vt, 32)
    ref = bary_interpolate(np.asarray(model.lbs_weights), uv.faces_v, r)
    fid = np.maximum(r.face_id, 0)
    out = gen_lbs_weight_from_ori(
        model.lbs_weights, jnp.asarray(r.bary), jnp.asarray(uv.faces_v[fid])
    )
    mask = r.face_id >= 0
    np.testing.assert_allclose(np.asarray(out)[mask], ref[mask], atol=1e-5)
