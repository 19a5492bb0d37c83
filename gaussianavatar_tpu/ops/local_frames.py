"""Local-frame transform helpers for POP-style pipelines
(reference model/modules.py:585-639 / utils/general_utils.py:223-259).
Used by POP/SCALE variants that predict offsets in per-triangle local frames
instead of canonical space; provided for full capability parity (the main
GaussianAvatar path predicts canonical offsets and does not call these)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gen_transf_mtx_full_uv(verts: jax.Array, faces: jax.Array) -> jax.Array:
    """Per-UV-pixel local->global frames from a posed mesh.

    verts: (B, V, 3); faces: (R, R, 3) per-pixel vertex ids.
    Returns (B, R, R, 3, 3) whose columns are [uu, vv, ww]: the two triangle
    edges and the unit normal scaled by the mean edge length (the local axes
    are barycentric-like, NOT orthonormal — reference modules.py:585-617)."""
    tris = verts[:, faces]  # (B, R, R, 3, 3)
    v1, v2, v3 = tris[..., 0, :], tris[..., 1, :], tris[..., 2, :]
    uu = v2 - v1
    vv = v3 - v1
    ww_raw = jnp.cross(uu, vv)
    ww = ww_raw / jnp.maximum(jnp.linalg.norm(ww_raw, axis=-1, keepdims=True), 1e-12)
    ww_norm = (
        jnp.linalg.norm(uu, axis=-1).mean(axis=(-1, -2))
        + jnp.linalg.norm(vv, axis=-1).mean(axis=(-1, -2))
    ) / 2.0
    ww = ww * ww_norm[:, None, None, None]
    return jnp.stack([uu, vv, ww], axis=-1)


def gen_transf_mtx_from_vtransf(
    vtransf: jax.Array, bary_coords: jax.Array, faces: jax.Array, scaling: float = 1.0
) -> jax.Array:
    """Barycentric interpolation of per-vertex transforms onto the UV grid.

    vtransf: (B, V, 3, 3); bary_coords: (R, R, 3); faces: (R, R, 3).
    Returns (B, R, R, 3, 3) (reference modules.py:620-639)."""
    tri_tf = vtransf[:, faces]  # (B, R, R, 3, 3, 3)
    out = jnp.einsum("bpqijk,pqi->bpqjk", tri_tf, bary_coords,
                     precision=jax.lax.Precision.HIGHEST)
    return out * scaling


def gen_lbs_weight_from_ori(
    lbs_weights: jax.Array, bary_coords: jax.Array, faces: jax.Array
) -> jax.Array:
    """Barycentric interpolation of skinning weights onto the UV grid
    (reference general_utils.py:245-259); the jit-able twin of
    ops.uv_raster.bary_interpolate."""
    tri_w = lbs_weights[faces]  # (R, R, 3, J)
    return jnp.einsum("pqik,pqi->pqk", tri_w, bary_coords,
                      precision=jax.lax.Precision.HIGHEST)
