"""Ablate the decoder+LBS piece of the canonical step (the 22.9 ms of
nonraster_bench's decoder_fwd_bwd): time each sub-piece as its own jitted
fwd+bwd program at the canonical shapes.

  mlp            — ShapeDecoder alone on (1, Nv, 66)
  upsample       — pop_upsample 128->512 + valid gather fwd+bwd
  geomconv       — GeomConvLayers 3x conv5x5 on (1,128,128,64)
  lbs_skin       — body forward + skinning transform per frame (B=2)
  forward_gauss  — the whole _forward_gaussians (reference total)

    python scripts/decoder_ablate.py [--query 512] [--bf16 0]
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
    ap.add_argument("--bf16", type=int, default=0)
    ap.add_argument("--fused", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gaussianavatar_tpu.engine.train_step import _forward_gaussians, init_state
    from gaussianavatar_tpu.models.avatar import AvatarNet, build_avatar_assets
    from gaussianavatar_tpu.models.decoder import ShapeDecoder, ShapeDecoderFused
    from gaussianavatar_tpu.models.layers import GeomConvLayers
    from gaussianavatar_tpu.ops.resample import pop_upsample
    from gaussianavatar_tpu.utils.synthetic import synthetic_body, synthetic_pose

    NF = 64
    Bt = args.batch
    model, uv = synthetic_body(n_rings=48, n_cols=32)
    J = model.parents.shape[0]
    assets = build_avatar_assets(
        model, uv.verts, uv.uvs, uv.faces_v, uv.faces_vt,
        np.zeros(J * 3, np.float32), np.zeros(4, np.float32),
        query_res=args.query, pad_to=256,
    )
    Nv = int(assets.query_points.shape[0])
    poses = np.stack([synthetic_pose(model, t / NF) for t in range(NF)])
    cdt = "bfloat16" if args.bf16 else "float32"
    net = AvatarNet(
        num_frames=NF, pose_dim=poses.shape[1], c_geom=64, c_pose=64,
        inp_posmap_size=128, hsize=128, nf=32, train_stage=1,
        compute_dtype=cdt, decoder_impl="fused" if args.fused else "ref",
        pose_init=poses, transl_init=np.zeros((NF, 3), np.float32),
    )

    class _TX0:
        def init(self, p):
            return None

    state = init_state(net, assets, _TX0(), batch_size=Bt)
    it = jnp.int32(10)

    def batch_for(i):
        idx = (jnp.arange(Bt, dtype=jnp.int32) + i) % NF
        return {"pose_idx": idx}

    feeds = [jax.device_put(batch_for(i)) for i in range(4)]

    def timed(name, jfn, mkargs):
        out = jfn(*mkargs(0))
        float(jnp.sum(jax.tree.leaves(out)[0]))
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = jfn(*mkargs(i % 4))
        float(jnp.sum(jax.tree.leaves(out)[0]))
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name:14s} {ms:8.2f} ms", flush=True)
        return ms

    rng = jax.random.PRNGKey(0)

    # ---- MLP alone
    dec = (ShapeDecoderFused if args.fused else ShapeDecoder)(
        hsize=128, compute_dtype=cdt)
    xin = jax.random.normal(rng, (1, Nv, 66), jnp.float32) * 0.5
    dvars = dec.init(jax.random.PRNGKey(1), xin, True)

    @jax.jit
    def mlp(p, xi):
        def f(pp):
            (a, b, c), _ = dec.apply(
                {"params": pp, "batch_stats": dvars["batch_stats"]}, xi, True,
                mutable=["batch_stats"])
            return jnp.sum(a) + jnp.sum(b) + jnp.sum(c)
        g = jax.grad(f)(p)
        return sum(jnp.sum(jnp.abs(t)) for t in jax.tree.leaves(g))

    xs = [jax.device_put(xin + 0.01 * i) for i in range(4)]
    timed("mlp", mlp, lambda i: (dvars["params"], xs[i]))

    # ---- upsample + gather
    feat = jax.random.normal(rng, (1, 128, 128, 64), jnp.float32)
    vidx = assets.valid_idx

    @jax.jit
    def ups(f):
        def g(ff):
            up = pop_upsample(ff, args.query)
            flat = up.reshape(1, args.query * args.query, -1)
            return jnp.sum(jnp.abs(flat[:, vidx, :]))
        return jnp.sum(jnp.abs(jax.grad(g)(f)))

    fs = [jax.device_put(feat + 0.01 * i) for i in range(4)]
    timed("upsample", ups, lambda i: (fs[i],))

    # ---- geom conv layers
    gc = GeomConvLayers(64, 64)
    gvars = gc.init(jax.random.PRNGKey(2), feat, True)

    @jax.jit
    def geom(p, f):
        def g(pp):
            out, _ = gc.apply(
                {"params": pp, "batch_stats": gvars.get("batch_stats", {})},
                f, True, mutable=["batch_stats"])
            return jnp.sum(jnp.abs(out))
        gr = jax.grad(g)(p)
        return sum(jnp.sum(jnp.abs(t)) for t in jax.tree.leaves(gr))

    timed("geomconv", geom, lambda i: (gvars["params"], fs[i]))

    # ---- LBS + skinning (pose-dependent half): grads to pose + offsets
    from gaussianavatar_tpu.models.avatar import pose_gaussians

    @jax.jit
    def lbs_skin(pose, transl, offs):
        def f(po, tr, of):
            world = pose_gaussians(model, assets, po, tr, of)
            return jnp.sum(jnp.abs(world))
        g = jax.grad(f, argnums=(0, 1, 2))(pose, transl, offs)
        return sum(jnp.sum(jnp.abs(t)) for t in jax.tree.leaves(g))

    offs = jnp.zeros((Bt, Nv, 3), jnp.float32) + 0.001
    pose2 = jnp.asarray(poses[:Bt])
    tr2 = jnp.zeros((Bt, 3), jnp.float32)
    timed("lbs_skin", lbs_skin, lambda i: (pose2 + 1e-3 * i, tr2, offs))

    # ---- whole _forward_gaussians (same as nonraster_bench decoder_fwd_bwd)
    @jax.jit
    def fwd_gauss(params, batch):
        def f(p):
            variables = {"params": p, "batch_stats": state.batch_stats}
            world, shs, scales3, rotations, opacity, aux, _ = _forward_gaussians(
                net, variables, model, assets, batch, it, True, True
            )
            return (jnp.sum(world * 1e-3) + jnp.sum(shs) + jnp.sum(scales3)
                    + jnp.sum(rotations) + jnp.sum(opacity) + aux["offset_loss"])
        g = jax.grad(f)(params)
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))

    timed("forward_gauss", fwd_gauss, lambda i: (state.params, feeds[i]))


if __name__ == "__main__":
    main()
