import os
from os.path import join

import numpy as np
import pytest

from gaussianavatar_tpu.config import ModelParams


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    from gaussianavatar_tpu.data.synthetic_writer import write_synthetic_dataset

    root = tmp_path_factory.mktemp("ds")
    write_synthetic_dataset(str(root), n_train=5, n_test=3, image_size=48)
    return str(root)


def _mp(data_root, **kw):
    return ModelParams(source_path=data_root, model_path="/tmp/x",
                       dataset_type="synthetic", **kw)


def test_train_dataset_items(data_root):
    from gaussianavatar_tpu.data.dataset import MonoDatasetTrain

    ds = MonoDatasetTrain(_mp(data_root))
    assert len(ds) == 5
    item = ds[0]
    assert item["original_image"].shape == (3, 48, 48)
    assert item["original_image"].max() <= 1.0
    # masked background must be exactly white
    img = item["original_image"]
    corner = img[:, 0, 0]
    np.testing.assert_allclose(corner, 1.0, atol=1e-5)
    assert item["world_view_transform"].shape == (4, 4)
    assert np.isfinite(item["full_proj_transform"]).all()
    assert abs(float(item["tan_fovx"]) - np.tan(item["FovX"] / 2)) < 1e-6


def test_test_dataset_has_pose_data(data_root):
    from gaussianavatar_tpu.data.dataset import MonoDatasetTest

    ds = MonoDatasetTest(_mp(data_root))
    item = ds[1]
    assert "pose_data" in item and "transl_data" in item
    assert item["pose_data"].shape == ds.pose_data.shape[1:]


def test_novel_pose_dataset(data_root):
    from gaussianavatar_tpu.data.dataset import MonoDatasetNovelPose

    mp = _mp(data_root)
    mp.test_folder = join(data_root, "test")
    ds = MonoDatasetNovelPose(mp, height=64, width=64)
    assert len(ds) == 3
    item = ds[0]
    assert int(item["height"]) == 64
    assert "original_image" not in item


def test_novel_view_orbit(data_root):
    from gaussianavatar_tpu.data.dataset import MonoDatasetNovelView

    ds = MonoDatasetNovelView(_mp(data_root))
    ds.set_fixed_pose(0, frame_num=8, pelvis_pos=np.array([0, 0.8, 0]))
    c0 = ds[0]["camera_center"]
    c4 = ds[4]["camera_center"]  # half orbit -> opposite side
    mid = np.array([0, 0.8, 0]) + ds.transl_data[0]
    d0, d4 = c0 - mid, c4 - mid
    # opposite azimuth: x/z components roughly negated, same radius
    assert np.linalg.norm(d0) == pytest.approx(np.linalg.norm(d4), rel=0.05)
    assert np.dot(d0[[0, 2]], d4[[0, 2]]) < 0


def test_batch_loader(data_root):
    from gaussianavatar_tpu.data.dataset import BatchLoader, MonoDatasetTrain

    ds = MonoDatasetTrain(_mp(data_root))
    loader = BatchLoader(ds, batch_size=2, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == 2  # 5 // 2, drop_last
    assert batches[0]["original_image"].shape == (2, 3, 48, 48)
    assert batches[0]["pose_idx"].shape == (2,)


REF_TEST_POSE = "/root/reference/assets/test_pose"


@pytest.mark.skipif(not os.path.isdir(REF_TEST_POSE), reason="reference assets absent")
def test_novel_pose_reads_reference_shipped_asset():
    """The reference ships 480 demo poses as a torch .pth + static camera
    (assets/test_pose, dataset_mono.py:419-522); the torch-free reader must
    drive MonoDatasetNovelPose from them directly."""
    from gaussianavatar_tpu.data.dataset import MonoDatasetNovelPose

    mp = ModelParams(source_path="/tmp/x", model_path="/tmp/x")
    mp.test_folder = REF_TEST_POSE
    ds = MonoDatasetNovelPose(mp)  # default 1024x1024, like the reference
    assert len(ds) == 480
    item = ds[17]
    assert item["pose_data"].shape == (72,)
    assert item["transl_data"].shape == (3,)
    assert int(item["height"]) == 1024
    assert np.isfinite(item["full_proj_transform"]).all()


def test_drop_image_cache_skips_decode(data_root):
    """With the GT device bank active the train loop calls drop_image_cache:
    items must keep cameras (with the right H/W) but stop decoding frames."""
    from gaussianavatar_tpu.data.dataset import MonoDatasetTrain

    ds = MonoDatasetTrain(_mp(data_root))
    item = ds[0]
    assert "original_image" in item
    h, w = int(item["height"]), int(item["width"])

    ds.drop_image_cache()
    assert not ds._frame_cache
    item2 = ds[0]
    assert "original_image" not in item2
    assert int(item2["height"]) == h and int(item2["width"]) == w
    assert "world_view_transform" in item2
