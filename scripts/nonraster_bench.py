"""Microbench: the NON-raster half of the canonical train step.

The round-4 decomposition priced the raster fwd+bwd at ~50 ms of the
75.6 ms adopted-config canonical step (13.2 it/s), leaving ~25 ms that has
never been attributed: POP decoder fwd+bwd (geo featmap 128^2 -> ~3 M-param
convs/MLP over ~205k query points), LBS + skinning, SSIM(11x11)+L1 on
(B,3,512,512), and the optax update over ~3.4 M params. This script times
each piece as its own jitted program at the exact bench.py extra-3 shapes:

  decoder_fwd_bwd  — _forward_gaussians + grads to params (no raster/losses)
  losses_fwd_bwd   — SSIM+L1 fwd + grads w.r.t. the rendered images
  optimizer_only   — tx.update + param apply with fixed grads
  full_step        — the production fused step (same-session reference)

Pieces are separately-jitted programs, so their sum exceeds the fused
full step (XLA overlaps/fuses across the pieces there); read them as
upper bounds that rank the targets. Timing: N reps, one device->host
scalar VALUE fetch after the loop (block_until_ready can return early
through the axon tunnel — BASELINE.md round-4 timing correction).

    python scripts/nonraster_bench.py             # canonical 512-query
    python scripts/nonraster_bench.py --query 384 # the <=256-query shape
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", type=int, default=512)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--bf16", type=int, default=0,
                    help="1 = ShapeDecoder matmuls in bf16 (the "
                         "NetworkParams.bf16_decoder knob)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gaussianavatar_tpu.config import OptimizationParams
    from gaussianavatar_tpu.engine.optim import build_optimizer
    from gaussianavatar_tpu.engine.train_step import (
        _forward_gaussians,
        init_state,
        make_train_step,
    )
    from gaussianavatar_tpu.models.avatar import AvatarNet, build_avatar_assets
    from gaussianavatar_tpu.ops.camera import Camera
    from gaussianavatar_tpu.ops.rasterize import RasterizeConfig
    from gaussianavatar_tpu.ops.ssim import l1_loss, ssim
    from gaussianavatar_tpu.utils.synthetic import synthetic_body, synthetic_pose

    H = W = 512
    NF = 64
    Bt = args.batch
    model, uv = synthetic_body(n_rings=48, n_cols=32)
    J = model.parents.shape[0]
    assets = build_avatar_assets(
        model, uv.verts, uv.uvs, uv.faces_v, uv.faces_vt,
        np.zeros(J * 3, np.float32), np.zeros(4, np.float32),
        query_res=args.query, pad_to=256,
    )
    K = np.array([[560.0, 0, W / 2], [0, 560.0, H / 2], [0, 0, 1]], np.float32)
    cam = Camera.from_extrinsics(
        np.eye(3, dtype=np.float32), np.array([0.0, -0.8, 1.6], np.float32), K, H, W
    )
    poses = np.stack([synthetic_pose(model, t / NF) for t in range(NF)])
    net = AvatarNet(
        num_frames=NF, pose_dim=poses.shape[1], c_geom=64, c_pose=64,
        inp_posmap_size=128, hsize=128, nf=32, train_stage=1,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        pose_init=poses, transl_init=np.zeros((NF, 3), np.float32),
    )

    class _TX0:
        def init(self, p):
            return None

    state = init_state(net, assets, _TX0(), batch_size=Bt)
    opt = OptimizationParams()
    tx = build_optimizer(state.params, opt, steps_per_epoch=NF // Bt, train_stage=1)
    state = state.replace(opt_state=tx.init(state.params))

    it = jnp.int32(10)
    gt = jnp.zeros((Bt, 3, H, W), jnp.float32) + 0.5

    def batch_for(i):
        idx = (jnp.arange(Bt, dtype=jnp.int32) + i) % NF
        tile = lambda x: jnp.tile(x[None], (Bt,) + (1,) * x.ndim)
        return {
            "pose_idx": idx,
            "world_view_transform": tile(cam.world_view_transform),
            "full_proj_transform": tile(cam.full_proj_transform),
            "tan_fovx": tile(cam.tan_fovx),
            "tan_fovy": tile(cam.tan_fovy),
            "original_image": gt,
        }

    feeds = [jax.device_put(batch_for(i)) for i in range(4)]

    def sync(x):
        float(jnp.sum(x))

    def timed(name, jfn, mkargs):
        out = jfn(*mkargs(0))
        sync(out if isinstance(out, jax.Array) else jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = jfn(*mkargs(i % 4))
        sync(out if isinstance(out, jax.Array) else jax.tree.leaves(out)[0])
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name:18s} {ms:8.2f} ms", flush=True)
        return ms

    # ---- decoder + LBS fwd+bwd (grads to params), raster/losses excluded.
    # The checksum consumes every output so nothing DCEs.
    @jax.jit
    def decoder_fwd_bwd(params, batch):
        def f(p):
            variables = {"params": p, "batch_stats": state.batch_stats}
            world, shs, scales3, rotations, opacity, aux, _ = _forward_gaussians(
                net, variables, model, assets, batch, it, True, True
            )
            return (jnp.sum(world * 1e-3) + jnp.sum(shs) + jnp.sum(scales3)
                    + jnp.sum(rotations) + jnp.sum(opacity) + aux["offset_loss"])
        g = jax.grad(f)(params)
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))

    timed("decoder_fwd_bwd", decoder_fwd_bwd, lambda i: (state.params, feeds[i]))

    # ---- SSIM + L1 fwd+bwd w.r.t. images (the loss side of the step)
    @jax.jit
    def losses_fwd_bwd(img, gt_):
        def f(x):
            return ((1.0 - opt.lambda_dssim) * l1_loss(x, gt_)
                    + opt.lambda_dssim * (1.0 - ssim(x, gt_)))
        return jnp.sum(jnp.abs(jax.grad(f)(img)))

    imgs = [jax.device_put(jnp.full((Bt, 3, H, W), 0.25 + 0.01 * i, jnp.float32))
            for i in range(4)]
    timed("losses_fwd_bwd", losses_fwd_bwd, lambda i: (imgs[i], gt))

    # ---- optimizer only: tx.update + apply at fixed grads
    fixed_grads = jax.tree.map(lambda p: jnp.full_like(p, 1e-6), state.params)

    @jax.jit
    def optimizer_only(params, opt_state, scale):
        g = jax.tree.map(lambda x: x * scale, fixed_grads)
        updates, new_opt = tx.update(g, opt_state, params)
        new_params = jax.tree.map(lambda p, u: p + u, params, updates)
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(new_params))

    timed("optimizer_only", optimizer_only,
          lambda i: (state.params, state.opt_state, jnp.float32(1.0 + i)))

    # ---- full fused step, same session (the adopted fast canonical config)
    raster_cfg = RasterizeConfig(
        tile_size=32, tile_capacity=128, max_tiles_per_gaussian=4,
        sort_stable=False, ragged=True, ragged_chunk=128, ragged_budget=576,
        blend_vec=True,
    )
    step = make_train_step(
        net, model, assets, tx, opt, H, W, (1.0, 1.0, 1.0), raster_cfg,
        train_stage=1,
    )
    ones = jnp.float32(1.0)
    st = state

    def run_step(i):
        nonlocal st
        st, terms, _ = step(st, feeds[i], ones, ones * 0, ones * 0)
        return terms["total"]

    out = run_step(0)
    sync(out)
    t0 = time.perf_counter()
    for i in range(args.iters):
        out = run_step(i % 4)
    sync(out)
    ms = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"{'full_step':18s} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
