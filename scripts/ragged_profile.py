"""Prefix-timing decomposition of the ragged raster step (VERDICT r4 #3 tool).

The piece-ablation method (scripts/step_decomposition.py) cannot decompose
the ragged pipeline: replacing the front with constant geometry collapses
coverage onto a few tiles, so every data-dependent downstream piece (chunk
maps, gather, blend early-exits) does almost no work and the "front" delta
absorbs their real cost (~17 ms attributed vs 1.7 ms isolated —
scripts/front_profile.py). This script instead times PREFIXES of the real
pipeline, each cut consuming its frontier values with an order-dependent
reduction (iota-weighted dot, so sorts survive DCE):

  front    — embeddings -> LBS skin -> attrs -> EWA projection
  keys     — + footprint rects + (tile|depth) key construction
  sort     — + the flat binning sort (the L = B*N*M key sort)
  offsets  — + searchsorted tile boundaries + per-tile counts
  maps     — + budget theta bisection + chunk maps + src indices
  gather   — + packed-table build + chunk-stream row gather (C*CB, 16)
  full     — + Pallas blend + background composite (the whole raster)

fwd for every prefix; fwd+bwd for the prefixes with a parameter gradient
path (front / gather / full — key construction is integer-only, so sort /
offsets / maps carry no backward of their own). Marginal stage cost =
difference of adjacent rows, with the usual fusion-overlap caveat (adjacent
prefixes can fuse differently; deltas are attribution, not contracts).

Run on the real chip:
    python scripts/ragged_profile.py --query 512 --budget 576 --m 4
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", type=int, default=512)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--budget", type=int, default=576,
                    help="ragged chunk budget, avg rows/tile (the adopted "
                         "fast config trains at margin-1.25 ~= 576)")
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--m", type=int, default=4)
    ap.add_argument("--stable", type=int, default=0)
    ap.add_argument("--blend_vec", type=int, default=1)
    ap.add_argument("--it", type=int, default=10,
                    help="scale warm-up iteration (10 = the warm-up-scale "
                         "scene every step_decomposition A/B row uses; "
                         ">=1000 = full trained-scale footprints)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gaussianavatar_tpu.engine.train_step import (
        init_state,
        precompute_canonical,
    )
    from gaussianavatar_tpu.models.avatar import (
        AvatarNet, build_avatar_assets, gaussian_attributes, pose_gaussians,
        scale_warmup,
    )
    from gaussianavatar_tpu.ops import rasterize_tile as rt
    from gaussianavatar_tpu.ops import rasterize_ragged as rr
    from gaussianavatar_tpu.ops.camera import Camera
    from gaussianavatar_tpu.ops.projection import project_gaussians
    from gaussianavatar_tpu.ops.rasterize import RasterizeConfig
    from gaussianavatar_tpu.utils.synthetic import synthetic_body, synthetic_pose

    H = W = args.size
    B = args.batch
    ts = 32
    M = args.m
    MW = MH = int(np.sqrt(M))
    CB = args.chunk
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
    it = jnp.int32(args.it)

    batch = {
        "pose_idx": jnp.arange(B, dtype=jnp.int32),
        "world_view_transform": jnp.tile(cam.world_view_transform[None], (B, 1, 1)),
        "full_proj_transform": jnp.tile(cam.full_proj_transform[None], (B, 1, 1)),
        "tan_fovx": jnp.tile(cam.tan_fovx[None], (B,)),
        "tan_fovy": jnp.tile(cam.tan_fovy[None], (B,)),
    }

    txn, tyn = -(-W // ts), -(-H // ts)
    n_tiles = txn * tyn
    G = B * n_tiles
    C = rr.chunk_slab(G, args.budget, CB)
    cfg = RasterizeConfig(
        tile_size=ts, tile_capacity=128, max_tiles_per_gaussian=M,
        sort_stable=bool(args.stable), ragged=True, ragged_chunk=CB,
        ragged_budget=args.budget, blend_vec=bool(args.blend_vec),
    )

    def idot(x):
        """Order-dependent consumer: iota-weighted dot (sorts survive)."""
        xf = x.reshape(-1).astype(jnp.float32)
        w = (jnp.arange(xf.shape[0], dtype=jnp.float32) % 37.0) * 1e-6
        return jnp.sum(xf * w)

    def prefix(params, stage):
        res, scales, shs = cache
        idx = batch["pose_idx"]
        pose = params["pose_embedding"][idx]
        transl = params["transl_embedding"][idx]
        res_b = jnp.broadcast_to(res[None], (B,) + res.shape)
        world = pose_gaussians(model, assets, pose, transl, res_b)
        scales_w = scale_warmup(scales[None], it)
        scales3, rotations, opacity = gaussian_attributes(
            assets, jnp.broadcast_to(scales_w, (B,) + scales.shape), shs)
        rots = (jnp.broadcast_to(rotations[None], (B,) + rotations.shape)
                if rotations.ndim == 2 else rotations)
        projs = jax.vmap(lambda m, s, r, wvt, fpt, tx, ty: project_gaussians(
            m, s, r, wvt, fpt, tx, ty, H, W))(
            world, scales3, rots, batch["world_view_transform"],
            batch["full_proj_transform"], batch["tan_fovx"], batch["tan_fovy"])
        colors = jnp.broadcast_to(shs[None], (B,) + shs.shape)
        opac = jnp.broadcast_to(opacity[None], (B, opacity.shape[0]))
        if stage == "front":
            return (idot(projs.means2d) + idot(projs.conics)
                    + idot(projs.depths) + idot(projs.radii))
        if stage == "full":
            img, ovf = rr.rasterize_views_ragged(
                projs, colors, opac, jnp.ones(3), H, W, cfg)
            return jnp.sum(img) + 0.0 * ovf.astype(jnp.float32)

        # open-coded _bin_gaussians prefix (mirrors rasterize_tile._bin_gaussians)
        from gaussianavatar_tpu.ops.rasterize_ref import ALPHA_MIN

        N = colors.shape[1]
        T = n_tiles
        depth_bits = 28
        while (B * T) << depth_bits >= 2 ** 31 and depth_bits > 8:
            depth_bits -= 1
        ops_ = opac
        v = (projs.radii > 0) & (ops_ >= ALPHA_MIN)
        x0, y0, spanx, spany, m_dropped, _ = rt._footprint_rects(
            projs.means2d, projs.radii, v, ts, txn, tyn, MW, MH)
        depth_key = jax.lax.shift_right_logical(
            jax.lax.bitcast_convert_type(
                jnp.maximum(projs.depths, 1e-6), jnp.int32),
            32 - depth_bits)
        slots = jnp.arange(M, dtype=jnp.int32)
        sx = (slots % MW)[:, None, None]
        sy = (slots // MW)[:, None, None]
        tile_x = x0[None] + sx
        tile_y = y0[None] + sy
        slot_valid = v[None] & (sx < spanx[None]) & (sy < spany[None])
        img_off = (jnp.arange(B, dtype=jnp.int32) * T)[None, :, None]
        tile_id = img_off + tile_y * txn + tile_x
        keys = jnp.where(
            slot_valid,
            jax.lax.shift_left(tile_id, depth_bits) | depth_key[None],
            jnp.int32(2 ** 31 - 1))
        rows = jnp.broadcast_to(
            (jnp.arange(B, dtype=jnp.int32) * N)[None, :, None]
            + jnp.arange(N, dtype=jnp.int32)[None, None, :], (M, B, N))
        if stage == "keys":
            return idot(keys) + idot(rows)
        if args.stable:
            sorted_keys, sorted_vals = jax.lax.sort(
                (keys.reshape(-1), rows.reshape(-1)), num_keys=2)
        else:
            sorted_keys, sorted_vals = jax.lax.sort_key_val(
                keys.reshape(-1), rows.reshape(-1), is_stable=False)
        if stage == "sort":
            return idot(sorted_keys) + idot(sorted_vals)
        boundaries = jax.lax.shift_left(
            jnp.arange(B * T + 1, dtype=jnp.int32), depth_bits)
        offsets = jnp.searchsorted(
            sorted_keys, boundaries, side="left").astype(jnp.int32)
        full_counts = offsets[1:] - offsets[:-1]
        if stage == "offsets":
            return idot(offsets) + idot(full_counts) + idot(sorted_vals)
        theta = rr._budget_theta(full_counts, CB, C)
        caps_eff = jnp.minimum(full_counts, theta)
        ct, k0, last = rr._chunk_maps(caps_eff, CB, C)
        L = sorted_vals.shape[0]
        k_row = jnp.repeat(k0, CB) + (jnp.arange(C * CB, dtype=jnp.int32) % CB)
        src = jnp.clip(offsets[jnp.repeat(ct, CB)] + k_row, 0, L - 1)
        if stage == "maps":
            return (idot(ct) + idot(k0) + idot(last) + idot(src)
                    + idot(sorted_vals))
        packed = jnp.concatenate(
            [projs.means2d.reshape(B * N, 2), projs.conics.reshape(B * N, 3),
             colors.reshape(B * N, 3), ops_.reshape(B * N, 1),
             jnp.ones((B * N, 1), jnp.float32),
             jnp.zeros((B * N, 6), jnp.float32)], axis=-1)
        table = packed[sorted_vals[src]].reshape(C, CB, 16)
        if stage == "gather":
            return idot(table)
        raise ValueError(stage)

    def timed(f, *a):
        f = jax.jit(f)

        def sync(out):
            # device->host VALUE fetch: cannot return before the queue
            # drains (BASELINE round-4 timing-methodology note)
            leaf = jax.tree.leaves(out)[0]
            return float(leaf.sum()) if leaf.ndim else float(leaf)

        out = f(*a)
        sync(out)
        t0 = time.time()
        for _ in range(args.iters):
            out = f(*a)
        sync(out)
        return (time.time() - t0) / args.iters * 1e3

    report = {"N": int(assets.num_valid), "B": B, "budget": args.budget,
              "C_chunks": int(C), "m": M, "stable": args.stable,
              "blend_vec": args.blend_vec}
    stages = ["front", "keys", "sort", "offsets", "maps", "gather", "full"]
    grad_stages = {"front", "gather", "full"}
    rows_out = {}
    prev = 0.0
    for st in stages:
        ms_f = timed(lambda p, s=st: prefix(p, s), state.params)
        entry = {"fwd": round(ms_f, 2), "fwd_marginal": round(ms_f - prev, 2)}
        if st in grad_stages:
            ms_g = timed(jax.grad(lambda p, s=st: prefix(p, s)), state.params)
            entry["fwd_bwd"] = round(ms_g, 2)
        rows_out[st] = entry
        print(f"prefix..{st:8s}: fwd {ms_f:7.2f} ms (+{ms_f - prev:6.2f})"
              + (f"   fwd+bwd {entry['fwd_bwd']:7.2f} ms"
                 if "fwd_bwd" in entry else ""), flush=True)
        prev = ms_f
    report["prefix_ms"] = rows_out
    print(json.dumps(report))


if __name__ == "__main__":
    main()
