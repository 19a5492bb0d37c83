import numpy as np

from gaussianavatar_tpu.ops.uv_raster import (
    bary_interpolate,
    rasterize_uv_atlas,
    uv_coord_map,
)
from gaussianavatar_tpu.utils.synthetic import synthetic_body


def _raster(size=128):
    model, uv = synthetic_body()
    r = rasterize_uv_atlas(uv.verts, uv.uvs, uv.faces_v, uv.faces_vt, size)
    return model, uv, r


def test_coverage_and_positions():
    model, uv, r = _raster()
    valid = r.face_id >= 0
    # the atlas (with 4% margin) covers most of the image
    assert 0.5 < valid.mean() < 0.95
    # interpolated positions stay inside the mesh bounding box
    lo, hi = uv.verts.min(0) - 1e-4, uv.verts.max(0) + 1e-4
    pts = r.position_map[valid]
    assert (pts >= lo).all() and (pts <= hi).all()
    # background is exactly zero / -1
    assert (r.position_map[~valid] == 0).all()


def test_pixel_maps_back_into_its_face():
    model, uv, r = _raster(64)
    R = 64
    rows, cols = np.nonzero(r.face_id >= 0)
    sel = np.random.default_rng(0).choice(len(rows), size=200, replace=False)
    for i in sel:
        rr, cc = rows[i], cols[i]
        f = r.face_id[rr, cc]
        tri = uv.uvs[uv.faces_vt[f]] * R - 0.5
        b = r.bary[rr, cc]
        # barycentric combination must reproduce the pixel center
        p = b @ tri
        assert abs(p[0] - cc) < 1e-3 and abs(p[1] - rr) < 1e-3


def test_bary_interpolate_consistency():
    """Interpolating the vertex positions must reproduce the position map —
    and interpolating lbs weights yields rows that sum to 1 (valid px)."""
    model, uv, r = _raster(96)
    pos2 = bary_interpolate(uv.verts, uv.faces_v, r)
    np.testing.assert_allclose(pos2, r.position_map, atol=1e-5)

    lbs_map = bary_interpolate(np.asarray(model.lbs_weights), uv.faces_v, r)
    valid = r.face_id >= 0
    np.testing.assert_allclose(lbs_map[valid].sum(-1), 1.0, atol=1e-5)
    assert (lbs_map[~valid] == 0).all()


def test_uv_coord_map_convention():
    m = uv_coord_map(4)
    assert m.shape == (16, 2)
    np.testing.assert_allclose(m[0], [0, 0])
    np.testing.assert_allclose(m[3], [0, 1])   # (row, col)/(R-1): col-major last
    np.testing.assert_allclose(m[12], [1, 0])
    np.testing.assert_allclose(m[15], [1, 1])
