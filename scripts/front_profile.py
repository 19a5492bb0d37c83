"""Profile the canonical step's projection FRONT (VERDICT round-4 #3).

The round-4 step decomposition measured ~17 ms fwd+bwd for the "front" —
everything before binning: per-frame embedding lookup -> LBS-skin 205k query
points (models/avatar.pose_gaussians) -> gaussian_attributes -> EWA
projection (ops/projection.project_gaussians) — and called it "issue-bound,
unprofiled at HLO level". This script does the profile:

1. PREFIX TIMING — jit the front cut at each sub-stage boundary (skin,
   attrs, project), fwd and fwd+bwd, so each stage's marginal cost is the
   difference of adjacent rows (with the usual XLA-fusion overlap caveat).
2. HLO HISTOGRAM — dump the optimized HLO of the full front fwd+bwd and
   count fusion kinds (kLoop/kInput/kOutput fusions, copies, transposes,
   all-reduce/sort/scatter leftovers) + the largest intermediate buffers,
   which is what "serialized ops" look like post-compile.
3. PRECISION A/B — the front runs its thin matmuls/einsums at
   Precision.HIGHEST (6-pass f32 emulation); time DEFAULT for the cov2d
   chain to see whether the emulation passes matter at these shapes.

Run on the real chip: `python scripts/front_profile.py [--query 512]`.
"""

import argparse
import json
import os
import sys
import time
from collections import Counter

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", type=int, default=512)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gaussianavatar_tpu.engine.train_step import (
        init_state,
        precompute_canonical,
    )
    from gaussianavatar_tpu.models import body as body_mod
    from gaussianavatar_tpu.models.avatar import (
        AvatarNet,
        build_avatar_assets,
        gaussian_attributes,
        pose_gaussians,
        scale_warmup,
    )
    from gaussianavatar_tpu.ops.camera import Camera
    from gaussianavatar_tpu.ops.projection import project_gaussians
    from gaussianavatar_tpu.utils.synthetic import synthetic_body, synthetic_pose

    H = W = args.size
    B = args.batch
    NF = 16
    model, uv = synthetic_body(n_rings=48, n_cols=32)
    J = model.parents.shape[0]
    assets = build_avatar_assets(
        model, uv.verts, uv.uvs, uv.faces_v, uv.faces_vt,
        np.zeros(J * 3, np.float32), np.zeros(4, np.float32),
        query_res=args.query, pad_to=256,
    )
    Km = np.array([[560.0, 0, W / 2], [0, 560.0, H / 2], [0, 0, 1]], np.float32)
    cam = Camera.from_extrinsics(
        np.eye(3, dtype=np.float32), np.array([0.0, -0.8, 1.6], np.float32),
        Km, H, W)
    poses = np.stack([synthetic_pose(model, t / NF) for t in range(NF)])
    net = AvatarNet(
        num_frames=NF, pose_dim=poses.shape[1], c_geom=64, c_pose=64,
        inp_posmap_size=128, hsize=128, nf=32, train_stage=1,
        pose_init=poses, transl_init=np.zeros((NF, 3), np.float32),
    )

    class _TX0:
        def init(self, p):
            return None

    state = init_state(net, assets, _TX0(), batch_size=B)
    cache = precompute_canonical(net, assets, state.params, state.batch_stats)
    it = jnp.int32(10)

    batch = {
        "pose_idx": jnp.arange(B, dtype=jnp.int32),
        "world_view_transform": jnp.tile(cam.world_view_transform[None], (B, 1, 1)),
        "full_proj_transform": jnp.tile(cam.full_proj_transform[None], (B, 1, 1)),
        "tan_fovx": jnp.tile(cam.tan_fovx[None], (B,)),
        "tan_fovy": jnp.tile(cam.tan_fovy[None], (B,)),
    }

    def front(params, stage):
        res, scales, shs = cache
        idx = batch["pose_idx"]
        pose = params["pose_embedding"][idx]
        transl = params["transl_embedding"][idx]
        res_b = jnp.broadcast_to(res[None], (B,) + res.shape)
        world = pose_gaussians(model, assets, pose, transl, res_b)
        if stage == "skin":
            return jnp.sum(world)
        scales_w = scale_warmup(scales[None], it)
        scales3, rotations, opacity = gaussian_attributes(
            assets, jnp.broadcast_to(scales_w, (B,) + scales.shape), shs)
        rots = (jnp.broadcast_to(rotations[None], (B,) + rotations.shape)
                if rotations.ndim == 2 else rotations)
        if stage == "attrs":
            return jnp.sum(world) + jnp.sum(scales3) + jnp.sum(opacity)
        projs = jax.vmap(lambda m, s, r, wvt, fpt, tx, ty: project_gaussians(
            m, s, r, wvt, fpt, tx, ty, H, W))(
            world, scales3, rots, batch["world_view_transform"],
            batch["full_proj_transform"], batch["tan_fovx"], batch["tan_fovy"])
        return (jnp.sum(projs.means2d) + jnp.sum(projs.conics)
                + jnp.sum(projs.depths) + jnp.sum(projs.radii))

    def timed(f, *a):
        f = jax.jit(f)
        out = f(*a)
        float(jax.tree.leaves(out)[0].sum()) if hasattr(
            jax.tree.leaves(out)[0], "sum") else float(jax.tree.leaves(out)[0])
        t0 = time.time()
        for _ in range(args.iters):
            out = f(*a)
        s = float(jax.tree.leaves(out)[0].sum()) if hasattr(
            jax.tree.leaves(out)[0], "sum") else float(jax.tree.leaves(out)[0])
        del s
        return (time.time() - t0) / args.iters * 1e3, f

    report = {"N": int(assets.num_valid), "B": B}
    rows = []
    for stage in ("skin", "attrs", "project"):
        ms_f, _ = timed(lambda p, st=stage: front(p, st), state.params)
        ms_g, _ = timed(jax.grad(lambda p, st=stage: front(p, st)), state.params)
        rows.append((stage, ms_f, ms_g))
        print(f"front..{stage:8s}: fwd {ms_f:6.2f} ms   fwd+bwd {ms_g:6.2f} ms",
              flush=True)
    report["prefix_ms"] = {s: {"fwd": round(f, 2), "fwd_bwd": round(g, 2)}
                           for s, f, g in rows}

    # HLO histogram of the full front fwd+bwd
    lowered = jax.jit(jax.grad(lambda p: front(p, "project"))).lower(state.params)
    compiled = lowered.compile()
    txt = compiled.as_text()
    ops = Counter()
    big = []
    for line in txt.splitlines():
        line = line.strip()
        if "= " not in line or line.startswith("ROOT"):
            pass
        for kind in ("fusion(", "copy(", "transpose(", "sort(", "scatter(",
                     "gather(", "reduce(", "dot(", "convolution(",
                     "custom-call(", "while(", "all-reduce("):
            if " " + kind in line or "= " + kind in line or line.find(kind) > 0:
                ops[kind[:-1]] += 1
                break
    # largest intermediates: parse f32[...] shapes on fusion outputs
    import re

    for m in re.finditer(r"(f32|bf16|s32)\[([\d,]+)\]", txt):
        dims = [int(x) for x in m.group(2).split(",") if x]
        n = int(np.prod(dims)) if dims else 1
        big.append((n * (2 if m.group(1) == "bf16" else 4), m.group(0)))
    big = sorted(set(big), reverse=True)[:8]
    report["hlo_ops"] = dict(ops)
    report["hlo_largest_buffers"] = [
        {"bytes": b, "type": t} for b, t in big]
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        report["cost_analysis"] = {
            "flops": float(ca.get("flops", 0.0)),
            "bytes": float(ca.get("bytes accessed", 0.0)),
        }
    except Exception:
        pass
    print("HLO op histogram:", dict(ops), flush=True)
    print("largest buffers:", [t for _, t in big], flush=True)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
