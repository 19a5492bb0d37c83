"""Write a complete reference-format dataset from the synthetic body.

Produces exactly the on-disk layout the data layer (and the reference repo)
consumes — train/test splits with images, masks, cam_parms.npz and
smpl_parms.pth — by splatting the synthetic body with procedurally colored
gaussians. This stands in for People Snapshot (which requires registration)
in CI, demos, and benchmarks; a user pointing the CLIs at real preprocessed
People Snapshot data exercises the identical code path.
"""

from __future__ import annotations

import os
from os.path import join

import numpy as np


def write_synthetic_dataset(
    out_dir: str,
    n_train: int = 12,
    n_test: int = 4,
    image_size: int = 128,
    seed: int = 0,
    body_kwargs: dict | None = None,
):
    import jax.numpy as jnp
    from PIL import Image

    from gaussianavatar_tpu.models import body as body_mod
    from gaussianavatar_tpu.ops.camera import Camera
    from gaussianavatar_tpu.ops.rasterize import RasterizeConfig, rasterize
    from gaussianavatar_tpu.utils.synthetic import synthetic_body, synthetic_pose

    model, uv = synthetic_body(**(body_kwargs or {}))
    J = model.parents.shape[0]
    H = W = image_size
    f = image_size * 1.1
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    extr = np.eye(4, dtype=np.float32)
    extr[:3, 3] = [0.0, -0.8, 1.6]
    R = extr[:3, :3].transpose(1, 0)  # dataset convention stores transposed
    cam = Camera.from_extrinsics(R.T, extr[:3, 3], K, H, W)

    vt = np.asarray(model.v_template)
    colors = jnp.asarray((vt - vt.min(0)) / (vt.max(0) - vt.min(0)), jnp.float32)
    scales = jnp.full((vt.shape[0], 3), 0.015)
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (vt.shape[0], 1))
    opac = jnp.ones((vt.shape[0],))
    cfg = RasterizeConfig(tile_size=16, tile_capacity=256, max_tiles_per_gaussian=16)

    import jax

    @jax.jit
    def _render_jit(pose, transl):
        out = body_mod.forward(
            model, jnp.zeros((1, model.shapedirs.shape[-1])),
            pose[None, :3], pose[None, 3:], transl=transl[None],
        )
        img = rasterize(out.vertices[0], colors, scales, quats, opac, cam,
                        jnp.ones(3), config=cfg)
        white = rasterize(out.vertices[0], jnp.ones_like(colors), scales, quats,
                          opac, cam, jnp.zeros(3), config=cfg)
        return img, white

    def render_frame(pose, transl):
        img, white = _render_jit(jnp.asarray(pose), jnp.asarray(transl))
        mask = np.asarray(white).max(0) > 0.5
        return np.clip(np.asarray(img), 0, 1), mask

    rng = np.random.default_rng(seed)
    splits = {"train": n_train, "test": n_test}
    t_global = 0
    for split, n in splits.items():
        d = join(out_dir, split)
        os.makedirs(join(d, "images"), exist_ok=True)
        os.makedirs(join(d, "masks"), exist_ok=True)
        poses, transls = [], []
        for i in range(n):
            t = (t_global + i) / (n_train + n_test)
            pose = synthetic_pose(model, t, amplitude=1.0)
            transl = np.asarray([0.02 * np.sin(7 * t), 0.0, 0.0], np.float32)
            img, mask = render_frame(pose, transl)
            arr = (img.transpose(1, 2, 0) * 255).astype(np.uint8)
            Image.fromarray(arr).save(join(d, "images", f"{i:08d}.png"))
            Image.fromarray((mask * 255).astype(np.uint8)).save(join(d, "masks", f"{i:08d}.png"))
            poses.append(pose)
            transls.append(transl)
        t_global += n

        np.savez(join(d, "cam_parms.npz"), extrinsic=extr, intrinsic=K)
        parms = {
            "beta": np.zeros((1, model.shapedirs.shape[-1]), np.float32),
            "body_pose": np.stack(poses),
            "trans": np.stack(transls),
        }
        from gaussianavatar_tpu.utils.torch_pth import save_pth

        save_pth(parms, join(d, "smpl_parms.pth"))
    return model, uv, cam
