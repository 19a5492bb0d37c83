"""Monocular avatar datasets — readers for the reference on-disk layout
(/root/reference/scene/dataset_mono.py:83-674):

    data_path/{train,test}/
        images/*.png|jpg      masks/*.png
        cam_parms.npz         (extrinsic 4x4-ish, intrinsic 3x3; static cam)
        cam_parms/<name>.npz  (per-frame, if cam_static=0)
        smpl_parms.pth        {beta (10,), body_pose (N,72|165), trans (N,3)}
        inp_map/inp_posemap_{S}_{idx:08d}.npz   (stage 2)

Four variants with reference semantics:
  - Train: images+masks, white-bg compositing (mask<128 -> bg), per-frame idx
  - Test: adds pose_data/transl_data taken from the (frozen) smpl params
  - NovelPose: poses from an external folder, fixed camera, 1024x1024
  - NovelView: HumanNeRF-style orbit camera around a fixed pose

All host-side numpy (no torch; .pth files read by utils.torch_pth); items are
dicts of numpy arrays keyed to the jitted step's batch contract (tan_fov*
precomputed). Decoded frames are RAM-cached as uint8; `BatchLoader` shuffles,
batches, drops last, and prefetches with a decode thread pool.
"""

from __future__ import annotations

import os
import threading
from os.path import join
from typing import Dict, Iterator, List, Optional

import numpy as np
from PIL import Image

from gaussianavatar_tpu.ops.camera import (
    focal2fov,
    projection_from_intrinsics,
    world_to_view,
)

ZNEAR, ZFAR = 0.01, 100.0


def load_smpl_parms(path: str) -> Dict[str, np.ndarray]:
    """Read smpl_parms.pth (torch-zip, no torch needed) or .npz into numpy."""
    if path.endswith(".npz") or (not os.path.exists(path) and os.path.exists(path + ".npz")):
        path = path if path.endswith(".npz") else path + ".npz"
        return {k: np.asarray(v) for k, v in np.load(path).items()}
    from gaussianavatar_tpu.utils.torch_pth import load_pth

    return {k: np.asarray(v) for k, v in load_pth(path).items()}


def _camera_item(R, T, intrinsic, height, width):
    """Build the per-item camera tensors exactly like the reference
    (dataset_mono.py:248-255), with tan-fov precomputed for the rasterizer."""
    fovx = focal2fov(intrinsic[0, 0], width)
    fovy = focal2fov(intrinsic[1, 1], height)
    w2v = world_to_view(R, T).T  # transposed convention
    proj = projection_from_intrinsics(ZNEAR, ZFAR, intrinsic, height, width).T
    full = w2v @ proj
    cam_center = np.linalg.inv(w2v)[3, :3]
    return {
        "FovX": np.float32(fovx),
        "FovY": np.float32(fovy),
        "tan_fovx": np.float32(np.tan(fovx * 0.5)),
        "tan_fovy": np.float32(np.tan(fovy * 0.5)),
        "world_view_transform": w2v.astype(np.float32),
        "projection_matrix": proj.astype(np.float32),
        "full_proj_transform": full.astype(np.float32),
        "camera_center": cam_center.astype(np.float32),
        "height": np.int32(height),
        "width": np.int32(width),
    }


def _read_static_cam(folder):
    cam = np.load(join(folder, "cam_parms.npz"))
    extr, intr = cam["extrinsic"], cam["intrinsic"]
    R = np.asarray(extr[:3, :3], np.float32).reshape(3, 3).transpose(1, 0)
    T = np.asarray(extr[:3, 3], np.float32)
    return R, T, np.asarray(intr, np.float32).reshape(3, 3)


class _MonoBase:
    split = "train"

    def __init__(self, model_parms):
        self.parms = model_parms
        self.data_folder = join(model_parms.source_path, self.split)
        self.no_mask = bool(model_parms.no_mask)
        self.smpl_type = model_parms.smpl_type
        self.train_stage = model_parms.train_stage
        self.inp_posmap_size = model_parms.inp_posmap_size
        # fixed_inp: a single static posmap replaces per-frame inp_map files
        # (injected by the train loop; avatar_model.py:70-72)
        self.fixed_inp = bool(getattr(model_parms, "fixed_inp", 0))

        parms_name = "smpl_parms.pth" if model_parms.train_stage == 1 else "smpl_parms_pred.pth"
        self.smpl_data = load_smpl_parms(join(self.data_folder, parms_name))

        img_dir = join(self.data_folder, "images")
        names = sorted(os.listdir(img_dir))
        self.data_length = len(names)
        self.name_list = [(i, n.split(".")[0]) for i, n in enumerate(names)]
        self.image_fix = names[0].split(".")[-1]
        if not self.no_mask:
            self.mask_fix = os.listdir(join(self.data_folder, "masks"))[0].split(".")[-1]

        if self.smpl_type == "smplx":
            self.pose_data = np.asarray(self.smpl_data["body_pose"][: self.data_length, :66], np.float32)
            self.rest_pose_data = np.asarray(self.smpl_data["body_pose"][: self.data_length, 66:], np.float32)
        else:
            self.pose_data = np.asarray(self.smpl_data["body_pose"][: self.data_length], np.float32)
            self.rest_pose_data = None
        self.transl_data = np.asarray(self.smpl_data["trans"][: self.data_length], np.float32)

        self.cam_static = bool(model_parms.cam_static)
        if self.cam_static:
            self.R, self.T, self.intrinsic = _read_static_cam(self.data_folder)

        self._frame_cache: Dict[str, tuple] = {}
        self._cache_frames = bool(getattr(model_parms, "cache_frames", 1))
        self._cache_bytes = 0
        self._cache_budget = 4 << 30  # hard cap: stop inserting past 4 GiB
        self._cache_lock = threading.Lock()
        # consumers that keep GT / input posmaps elsewhere (the train loop's
        # device banks) flip these off to skip the per-item decode entirely
        self.include_image = True
        self.include_inp = True
        self._hw: Optional[tuple] = None

    def __len__(self):
        return self.data_length

    def _load_cam(self, name_idx):
        if self.cam_static:
            return self.R, self.T, self.intrinsic
        cam = np.load(join(self.data_folder, "cam_parms", name_idx + ".npz"))
        extr, intr = cam["extrinsic"], cam["intrinsic"]
        R = np.asarray(extr[:3, :3], np.float32).reshape(3, 3).transpose(1, 0)
        T = np.asarray(extr[:3, 3], np.float32)
        return R, T, np.asarray(intr, np.float32).reshape(3, 3)

    def _load_image(self, name_idx):
        # decoded-frame RAM cache: epochs re-visit the same frames hundreds of
        # times; composited frames are kept as uint8 CHW (4x smaller than f32,
        # ~6.2 MB/frame at 1080p) and converted per access, capped at 4 GiB
        # (~650 1080p frames; beyond that later frames just re-decode).
        # Without it the PNG decode dominates the train wall clock (measured
        # 4 it/s loader-bound vs 22 it/s compute on a 512^2 synthetic run).
        cached = self._frame_cache.get(name_idx)
        if cached is not None:
            img_u8, h, w = cached
            return img_u8.astype(np.float32) / 255.0, h, w

        img, h, w = self._decode_image(name_idx)
        self._hw = (h, w)
        if self._cache_frames:
            # rint, not truncation: (k/255)*255 can land at k-epsilon.
            # Lock: BatchLoader decodes from a thread pool, so insertion and
            # the budget counter must not race (an unguarded += could
            # overshoot the 4 GiB budget by several frames)
            u8 = np.clip(np.rint(img * 255.0), 0, 255).astype(np.uint8)
            with self._cache_lock:
                if name_idx not in self._frame_cache and self._cache_bytes < self._cache_budget:
                    self._frame_cache[name_idx] = (u8, h, w)
                    self._cache_bytes += u8.nbytes
        return img, h, w

    def image_hw(self):
        """(H, W) without decoding more than one frame."""
        if self._hw is None:
            _, h, w = self._load_image(self.name_list[0][1])
            self._hw = (h, w)
        return self._hw

    def drop_image_cache(self):
        """Release the host frame cache and stop serving images (the train
        loop calls this once the GT lives on device as the uint8 bank —
        keeping a second host copy and re-decoding per batch would duplicate
        exactly the cost the bank removes)."""
        self.include_image = False
        self._frame_cache.clear()
        self._cache_bytes = 0
        self._cache_frames = False

    def _decode_image(self, name_idx):
        img_path = join(self.data_folder, "images", f"{name_idx}.{self.image_fix}")
        mask_path = (
            None if self.no_mask
            else join(self.data_folder, "masks", f"{name_idx}.{self.mask_fix}")
        )
        # native C++ decode + composite fast path
        try:
            from gaussianavatar_tpu import native

            size = native.image_size(img_path)
            if size is not None:
                w, h = size
                frame = native.load_frame(img_path, mask_path, 1.0, w, h)
                if frame is not None:
                    return frame, h, w
        except Exception:
            pass
        image = Image.open(img_path)
        width, height = image.size
        img = np.asarray(image, np.float32)
        if img.ndim == 2:
            img = img[..., None].repeat(3, -1)
        img = img[..., :3]
        if not self.no_mask:
            mask = np.asarray(
                Image.open(join(self.data_folder, "masks", f"{name_idx}.{self.mask_fix}"))
            )
            if mask.ndim == 3:
                mask = mask[..., 0]
            m = (mask >= 128).astype(np.float32)[..., None]
            img = img * m + (1 - m) * 255.0
        img = np.clip(img / 255.0, 0.0, 1.0).astype(np.float32)
        return img.transpose(2, 0, 1), height, width  # (3, H, W)

    def _load_inp_posmap(self, pose_idx):
        path = join(
            self.data_folder,
            "inp_map",
            "inp_posemap_%s_%s.npz" % (self.inp_posmap_size, str(pose_idx).zfill(8)),
        )
        pm = np.load(path)["posmap" + str(self.inp_posmap_size)]
        return np.asarray(pm, np.float32)  # (F, F, 3) NHWC for our UNet


class MonoDatasetTrain(_MonoBase):
    split = "train"

    def __getitem__(self, index) -> Dict[str, np.ndarray]:
        pose_idx, name_idx = self.name_list[index]
        R, T, intrinsic = self._load_cam(name_idx)
        item = {"pose_idx": np.int32(pose_idx)}
        if self.include_image:
            img, height, width = self._load_image(name_idx)
            item["original_image"] = img
        else:  # GT lives elsewhere (device bank); only cameras are needed
            height, width = self.image_hw()
        item.update(_camera_item(R, T, intrinsic, height, width))
        if self.smpl_type == "smplx":
            item["rest_pose"] = self.rest_pose_data[pose_idx]
        if self.train_stage == 2 and not self.fixed_inp and self.include_inp:
            item["inp_pos_map"] = self._load_inp_posmap(pose_idx)
        return item


class MonoDatasetTest(_MonoBase):
    split = "test"

    def __getitem__(self, index) -> Dict[str, np.ndarray]:
        pose_idx, name_idx = self.name_list[index]
        R, T, intrinsic = self._load_cam(name_idx)
        img, height, width = self._load_image(name_idx)
        item = {
            "original_image": img,
            "pose_idx": np.int32(pose_idx),
            "pose_data": self.pose_data[pose_idx],
            "transl_data": self.transl_data[pose_idx],
        }
        item.update(_camera_item(R, T, intrinsic, height, width))
        if self.smpl_type == "smplx":
            item["rest_pose"] = self.rest_pose_data[pose_idx]
        if self.train_stage == 2 and not self.fixed_inp:
            item["inp_pos_map"] = self._load_inp_posmap(pose_idx)
        return item


class MonoDatasetNovelPose:
    """Poses from an external folder (assets/test_pose), static camera,
    1024x1024 (dataset_mono.py:419-522)."""

    def __init__(self, model_parms, height: int = 1024, width: int = 1024):
        self.parms = model_parms
        self.data_folder = model_parms.test_folder
        self.smpl_type = model_parms.smpl_type
        self.train_stage = model_parms.train_stage
        self.inp_posmap_size = model_parms.inp_posmap_size
        self.height, self.width = height, width

        self.smpl_data = load_smpl_parms(join(self.data_folder, "smpl_parms.pth"))
        self.data_length = int(self.smpl_data["body_pose"].shape[0])
        if self.smpl_type == "smplx":
            self.pose_data = np.asarray(self.smpl_data["body_pose"][:, :66], np.float32)
            self.rest_pose_data = np.asarray(self.smpl_data["body_pose"][:, 66:], np.float32)
        else:
            self.pose_data = np.asarray(self.smpl_data["body_pose"], np.float32)
            self.rest_pose_data = None
        self.transl_data = np.asarray(self.smpl_data["trans"], np.float32)
        self.R, self.T, self.intrinsic = _read_static_cam(self.data_folder)

    def __len__(self):
        return self.data_length

    def __getitem__(self, index) -> Dict[str, np.ndarray]:
        item = {
            "pose_idx": np.int32(index),
            "pose_data": self.pose_data[index],
            "transl_data": self.transl_data[index],
        }
        item.update(_camera_item(self.R, self.T, self.intrinsic, self.height, self.width))
        if self.smpl_type == "smplx":
            item["rest_pose"] = self.rest_pose_data[index]
        if self.train_stage == 2:
            path = join(
                self.data_folder, "inp_map",
                "inp_posemap_%s_%s.npz" % (self.inp_posmap_size, str(index).zfill(8)),
            )
            item["inp_pos_map"] = np.asarray(np.load(path)["posmap" + str(self.inp_posmap_size)], np.float32)
        return item


def _rotate_extrinsics(extrinsic, angle, trans=None, rotate_axis="y"):
    """Orbit-camera update (HumanNeRF convention, dataset_mono.py:10-54)."""
    import cv2

    E = np.asarray(extrinsic, np.float64)
    inv_E = np.linalg.inv(E)
    camrot = inv_E[:3, :3]
    campos = inv_E[:3, 3]
    if trans is not None:
        campos = campos - trans
    if camrot.T[1, 1] < 0:
        angle = -angle
    axis_i = {"x": 0, "y": 1, "z": 2}[rotate_axis]
    vec = np.zeros(3)
    vec[axis_i] = angle
    gm = cv2.Rodrigues(vec)[0]
    rot_campos = gm @ campos
    rot_camrot = gm @ camrot
    if trans is not None:
        rot_campos = rot_campos + trans
    new_E = np.eye(4)
    new_E[:3, :3] = rot_camrot.T
    new_E[:3, 3] = -rot_camrot.T @ rot_campos
    return new_E


class MonoDatasetNovelView(_MonoBase):
    """Orbit the camera around one fixed pose (dataset_mono.py:524-674)."""

    split = "test"
    ROT_CAM_PARAMS = {
        "zju_mocap": {"rotate_axis": "z", "inv_angle": True},
        "wild": {"rotate_axis": "y", "inv_angle": False},
    }

    def __init__(self, model_parms, src_type: str = "wild"):
        super().__init__(model_parms)
        cam = np.load(join(self.data_folder, "cam_parms.npz"))
        self.extr_npy = np.asarray(cam["extrinsic"], np.float64)
        self.src_type = src_type
        self.fix_pose_idx = 0
        self.Th = np.zeros(3)

    def set_fixed_pose(self, pose_idx: int, frame_num: int, pelvis_pos=None):
        """Reference update_smpl (dataset_mono.py:597-609): orbit center is
        pelvis + transl; callers supply pelvis from the body model."""
        self.fix_pose_idx = pose_idx
        self.data_length = frame_num
        pp = np.zeros(3) if pelvis_pos is None else np.asarray(pelvis_pos)
        self.Th = pp + self.transl_data[pose_idx]

    def __getitem__(self, index) -> Dict[str, np.ndarray]:
        pose_idx = self.fix_pose_idx
        cfg = self.ROT_CAM_PARAMS[self.src_type]
        angle = 2 * np.pi * (index / self.data_length)
        if cfg["inv_angle"]:
            angle = -angle
        E = _rotate_extrinsics(self.extr_npy, angle, self.Th, cfg["rotate_axis"])
        R = np.asarray(E[:3, :3], np.float32).reshape(3, 3).transpose(1, 0)
        T = np.asarray(E[:3, 3], np.float32)

        _, name_idx = self.name_list[0]
        img, height, width = self._load_image(name_idx)
        item = {
            "pose_idx": np.int32(pose_idx),
            "pose_data": self.pose_data[pose_idx],
            "transl_data": self.transl_data[pose_idx],
        }
        item.update(_camera_item(R, T, self.intrinsic, height, width))
        if self.smpl_type == "smplx":
            item["rest_pose"] = self.rest_pose_data[pose_idx]
        if self.train_stage == 2 and not self.fixed_inp:
            item["inp_pos_map"] = self._load_inp_posmap(pose_idx)
        return item


def collate(items: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([it[k] for it in items]) for k in items[0]}


class BatchLoader:
    """Shuffling, batching, drop-last iterator with a background prefetch
    thread (the reference's DataLoader(num_workers=4) equivalent;
    avatar_model.py:238-244)."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True, seed: int = 0,
                 prefetch: int = 4, drop_last: bool = True, workers: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.prefetch = max(prefetch, 1)
        self.drop_last = drop_last
        self.workers = max(workers, 1)

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        import collections
        from concurrent.futures import ThreadPoolExecutor

        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        nb = len(self)

        def make(b):
            idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
            return collate([self.dataset[int(i)] for i in idxs])

        # pool of decode workers with an in-order sliding window of futures
        # (PIL/numpy/the native loader all release the GIL during decode)
        ex = ThreadPoolExecutor(max_workers=self.workers)
        try:
            futs = collections.deque(
                ex.submit(make, b) for b in range(min(self.prefetch, nb))
            )
            for b in range(nb):
                batch = futs.popleft().result()
                nxt = b + self.prefetch
                if nxt < nb:
                    futs.append(ex.submit(make, nxt))
                yield batch
        finally:
            # cancel_futures: an early exit (max_steps, consumer break) must
            # not leave queued decode tasks running behind the loop's back
            ex.shutdown(wait=False, cancel_futures=True)
