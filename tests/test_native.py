"""C++ native library: decode/composite parity vs PIL, threaded batch loader,
UV rasterizer parity vs the numpy implementation. Skipped when no toolchain."""

import os

import numpy as np
import pytest
from PIL import Image

from gaussianavatar_tpu import native

pytestmark = pytest.mark.skipif(native.get_lib() is None, reason="no native toolchain")


@pytest.fixture(scope="module")
def frames(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        img = (rng.uniform(size=(40, 32, 3)) * 255).astype(np.uint8)
        mask = ((rng.uniform(size=(40, 32)) > 0.5) * 255).astype(np.uint8)
        ip = os.path.join(root, f"i{i}.png")
        mp = os.path.join(root, f"m{i}.png")
        Image.fromarray(img).save(ip)
        Image.fromarray(mask).save(mp)
        paths.append((ip, mp, img, mask))
    return paths


def test_image_size_and_decode_parity(frames):
    ip, mp, img, mask = frames[0]
    assert native.image_size(ip) == (32, 40)
    out = native.load_frame(ip, None, 1.0, 32, 40)
    ref = img.astype(np.float32).transpose(2, 0, 1) / 255.0
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_mask_compositing_parity(frames):
    ip, mp, img, mask = frames[1]
    out = native.load_frame(ip, mp, 1.0, 32, 40)
    m = (mask >= 128).astype(np.float32)[None]
    ref = img.astype(np.float32).transpose(2, 0, 1) / 255.0 * m + (1 - m) * 1.0
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_batch_loader_threads(frames):
    imgs = [f[0] for f in frames]
    masks = [f[1] for f in frames]
    out = native.load_batch(imgs, masks, 1.0, 32, 40, n_threads=4)
    assert out.shape == (6, 3, 40, 32)
    for i, (ip, mp, img, mask) in enumerate(frames):
        single = native.load_frame(ip, mp, 1.0, 32, 40)
        np.testing.assert_array_equal(out[i], single)


def test_errors_reported(frames):
    assert native.image_size("/nonexistent.png") is None
    assert native.load_frame("/nonexistent.png", None, 1.0, 8, 8) is None
    # wrong expected size -> error, not garbage
    assert native.load_frame(frames[0][0], None, 1.0, 999, 999) is None


def test_jpeg_decode(tmp_path, frames):
    img = frames[0][2]
    jp = os.path.join(tmp_path, "a.jpg")
    Image.fromarray(img).save(jp, quality=95)
    out = native.load_frame(jp, None, 1.0, 32, 40)
    ref = np.asarray(Image.open(jp), np.float32).transpose(2, 0, 1) / 255.0
    # PIL and libjpeg may differ by ~1 LSB in IDCT rounding
    assert np.abs(out - ref).max() < 5.0 / 255.0


def test_uv_raster_parity():
    from gaussianavatar_tpu.ops import uv_raster
    from gaussianavatar_tpu.utils.synthetic import synthetic_body

    _, uv = synthetic_body()
    nat = native.rasterize_uv(uv.verts, uv.uvs, uv.faces_v, uv.faces_vt, 96)
    # run the pure-python path by temporarily disabling the native lib
    native._lib, native._tried, saved = None, True, native._lib
    try:
        py = uv_raster.rasterize_uv_atlas(uv.verts, uv.uvs, uv.faces_v, uv.faces_vt, 96)
    finally:
        native._lib, native._tried = saved, True
    np.testing.assert_array_equal(py.face_id, nat[1])
    np.testing.assert_allclose(py.position_map, nat[0], atol=1e-5)
    np.testing.assert_allclose(py.bary, nat[2], atol=1e-5)
