"""Render/train-step cost decomposition by piece ablation (run on the TPU).

Methodology (hard-won, see BASELINE.md round-3 "re-attribution"):
  - NEVER time a piece standalone with a `sum()` consumer: XLA deletes a
    sort feeding a commutative reduction and DCEs anything unconsumed —
    standalone "sort 0.67 ms" fantasies came from exactly that.
  - Instead, ablate INSIDE the full pipeline: replace one piece with a
    shape-compatible dummy that still consumes the upstream values (via a
    ~0 additive coupling, so nothing upstream is DCE'd) and keep everything
    downstream intact. piece_cost ~= t(full) - t(without_piece).
  - Consumers are order-dependent (iota-weighted dot) so sorts survive.
  - One block_until_ready after the loop; inputs vary across calls so the
    axon tunnel can't serve cached dispatches.

    python scripts/step_decomposition.py            # render forward, B=4
    python scripts/step_decomposition.py --grad     # fwd+bwd, B=2 (train shape)

Prints one line per variant + the derived per-piece attribution.
"""

import argparse
import functools
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=0, help="0 = 4 fwd / 2 grad")
    ap.add_argument("--grad", action="store_true",
                    help="differentiate a scalar loss through the pipeline "
                         "(train-step shape: includes the blend backward)")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--query", type=int, default=384,
                    help="avatar query resolution on the synthetic atlas: "
                         "384 ~= 115k gaussians (the reference 512-atlas "
                         "count); 512 ~= the canonical-campaign shape "
                         "(~205k); scale as (q/384)^2")
    ap.add_argument("--rounds", type=int, default=25)
    ap.add_argument("--stable", type=int, default=None,
                    help="override sort stability (default: grad->1, fwd->0)")
    ap.add_argument("--gather_flat", type=int, default=0,
                    help="1 = gather param slabs as dense 16-elem slices from "
                         "the flat packed table (gather_flat config knob)")
    ap.add_argument("--gather_window", type=int, default=0,
                    help="1 = permute packed into sorted order once, slabs as "
                         "contiguous compact windows (gather_window knob)")
    ap.add_argument("--kb", type=int, default=128,
                    help="base tier capacity (default: the swept 128)")
    ap.add_argument("--kh", type=int, default=768,
                    help="heavy tier capacity (default: the swept 768); use "
                         "e.g. --kb 8 --kh 4096 --frac 0.53 to approximate "
                         "the 512-query saturation cascade's cost (~2184)")
    ap.add_argument("--frac", type=float, default=0.25,
                    help="heavy tier tile fraction")
    ap.add_argument("--ragged", type=int, default=0,
                    help="1 = ragged slot-stream blend (rasterize_ragged) "
                         "instead of the capacity cascade; gather/blend "
                         "ablations apply to the ragged pieces")
    ap.add_argument("--ragged_budget", type=int, default=0,
                    help="ragged static budget, avg rows/tile (0 = worst "
                         "case: every binned pair fits)")
    ap.add_argument("--ragged_chunk", type=int, default=128)
    ap.add_argument("--m", type=int, default=9,
                    help="max_tiles_per_gaussian footprint cap (perfect "
                         "square; 9 = train default, 4 = render fast profile)")
    ap.add_argument("--blend_vec", type=int, default=1,
                    help="1 = row-vectorized blend kernels (ops/blend_vec; "
                         "the production default) — 0 restores the "
                         "sequential kernels for A/B")
    ap.add_argument("--only", default=None,
                    help="time just this variant (e.g. 'full') — for A/B "
                         "runs that don't need the whole ablation table")
    ap.add_argument("--scatter_nop", action="store_true",
                    help="TIMING-ONLY (wrong gradients): replace the gather's "
                         "backward scatter-add into the packed table with a "
                         "shape-compatible broadcast that still consumes the "
                         "incoming grads — isolates the scatter's cost inside "
                         "the fwd+bwd pipeline")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gaussianavatar_tpu.engine.train_step import (
        init_state, precompute_canonical,
    )
    from gaussianavatar_tpu.models.avatar import (
        AvatarNet, build_avatar_assets, gaussian_attributes, pose_gaussians,
        scale_warmup,
    )
    from gaussianavatar_tpu.ops import rasterize_tile as rt
    from gaussianavatar_tpu.ops.camera import Camera
    from gaussianavatar_tpu.ops.projection import ProjectedGaussians, project_gaussians
    from gaussianavatar_tpu.utils.synthetic import synthetic_body, synthetic_pose

    H = W = args.size
    B = args.batch or (2 if args.grad else 4)
    stable = bool(args.stable) if args.stable is not None else args.grad
    NF = 64
    model, uv = synthetic_body(n_rings=48, n_cols=32)
    J = model.parents.shape[0]
    assets = build_avatar_assets(
        model, uv.verts, uv.uvs, uv.faces_v, uv.faces_vt,
        np.zeros(J * 3, np.float32), np.zeros(4, np.float32),
        query_res=args.query, pad_to=256,
    )
    Km = np.array([[560.0 * H / 512, 0, W / 2], [0, 560.0 * H / 512, H / 2],
                   [0, 0, 1]], np.float32)
    cam = Camera.from_extrinsics(
        np.eye(3, dtype=np.float32), np.array([0.0, -0.8, 1.6], np.float32), Km, H, W
    )
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
    ts = 32
    txn, tyn = -(-W // ts), -(-H // ts)
    T = txn * tyn
    Kb, Kh, frac = args.kb, args.kh, args.frac
    M = args.m
    MW = int(math.isqrt(M))
    assert MW * MW == M, "--m must be a perfect square"
    G = B * T
    pxr = ts * ts // 128

    def batch_for(i):
        idx = (jnp.arange(B, dtype=jnp.int32) + i) % NF
        tile = lambda x: jnp.tile(x[None], (B,) + (1,) * x.ndim)
        return {
            "pose_idx": idx,
            "world_view_transform": tile(cam.world_view_transform),
            "full_proj_transform": tile(cam.full_proj_transform),
            "tan_fovx": tile(cam.tan_fovx), "tan_fovy": tile(cam.tan_fovy),
        }

    def front(params, batch):
        res, scales, shs = cache
        idx = batch["pose_idx"]
        pose = params["pose_embedding"][idx]
        transl = params["transl_embedding"][idx]
        res_b = jnp.broadcast_to(res[None], (B,) + res.shape)
        world = pose_gaussians(model, assets, pose, transl, res_b)
        scales_w = scale_warmup(scales[None], it)
        scales3, rotations, opacity = gaussian_attributes(
            assets, jnp.broadcast_to(scales_w, (B,) + scales.shape), shs)
        shs_b = jnp.broadcast_to(shs[None], (B,) + shs.shape)
        opac = opacity.reshape(-1, world.shape[1])
        if opac.shape[0] == 1:
            opac = jnp.broadcast_to(opac, (B, world.shape[1]))
        rots = (jnp.broadcast_to(rotations[None], (B,) + rotations.shape)
                if rotations.ndim == 2 else rotations)
        projs = jax.vmap(lambda m, s, r, wvt, fpt, tx, ty: project_gaussians(
            m, s, r, wvt, fpt, tx, ty, H, W))(
            world, scales3, rots, batch["world_view_transform"],
            batch["full_proj_transform"], batch["tan_fovx"], batch["tan_fovy"])
        return projs, shs_b, opac

    def pipeline(params, batch, skip=None):
        projs, colors, opacities = front(params, batch)
        N = colors.shape[1]
        if skip == "front":
            # keep a ~0 coupling to params so the front isn't re-introduced
            # through the consumer, yet nothing downstream is constant-folded
            s = jnp.sum(params["pose_embedding"]) * 1e-9
            mk = lambda shape, val: jnp.full(shape, val, jnp.float32) + s
            projs = ProjectedGaussians(
                means2d=mk((B, N, 2), 256.0 * H / 512), conics=mk((B, N, 3), 1.0),
                depths=mk((B, N), 1.5), radii=jnp.full((B, N), 4, jnp.int32))
            colors = mk((B, N, 3), 0.5)
            opacities = mk((B, N), 1.0)
        if skip == "bin":
            L = B * N * M
            s = jnp.sum(projs.depths) * 1e-9
            sorted_vals = (jnp.arange(L, dtype=jnp.int32) % (B * N))
            offsets = jnp.linspace(0, L, G + 1).astype(jnp.int32)
            full_counts = offsets[1:] - offsets[:-1]
            packed = jnp.concatenate([
                projs.means2d.reshape(B * N, 2), projs.conics.reshape(B * N, 3),
                colors.reshape(B * N, 3), opacities.reshape(B * N, 1),
                jnp.ones((B * N, 1)), jnp.zeros((B * N, 6))], axis=-1) + s
            ctx = rt.BinContext(offsets=offsets, sorted_vals=sorted_vals,
                                packed=packed, full_counts=full_counts,
                                m_dropped=jnp.int32(0))
        else:
            ctx = rt._bin_gaussians(projs, colors, opacities, H, W, ts, MW, MW,
                                    stable=stable)
        if args.ragged:
            from gaussianavatar_tpu.ops import rasterize_ragged as rr

            CB = args.ragged_chunk
            C = (-(-(G * args.ragged_budget) // CB) if args.ragged_budget
                 else -(-(B * N * M) // CB) + G)
            C = -(-C // 256) * 256 if C >= 256 else -(-C // 8) * 8
            theta = rr._budget_theta(ctx.full_counts, CB, C)
            caps_eff = jnp.minimum(ctx.full_counts, theta)
            ct, k0, last = rr._chunk_maps(caps_eff, CB, C)
            tloc = (jnp.arange(G, dtype=jnp.int32) % T).astype(jnp.int32)
            if skip == "gather":
                s = jnp.sum(ctx.sorted_vals) * jnp.float32(1e-12)
                table = jnp.broadcast_to(
                    ctx.packed[:CB][None], (C, CB, 16)) + s
            else:
                # mirrors rasterize_ragged's production gather (kernels gate
                # out-of-cap rows with k < count; no XLA-side mask)
                L = ctx.sorted_vals.shape[0]
                k_row = (jnp.repeat(k0, CB)
                         + (jnp.arange(C * CB, dtype=jnp.int32) % CB))
                src = jnp.clip(ctx.offsets[jnp.repeat(ct, CB)] + k_row,
                               0, L - 1)
                table = ctx.packed[ctx.sorted_vals[src]].reshape(C, CB, 16)
            if skip == "blend":
                color_t = jnp.mean(table) + jnp.zeros((G, 3, pxr, 128))
                fT = jnp.zeros((G, pxr, 128))
                return jnp.sum(color_t) + jnp.sum(fT)
            blend = rr._make_ragged_blend(txn, ts, G, CB, False,
                                          bool(args.blend_vec))
            c1, T1, _, _ = blend(table, caps_eff, ct, k0, last, tloc)
            vis = caps_eff > 0
            c1 = jnp.where(vis[:, None, None, None], c1, 0.0)
            T1 = jnp.where(vis[:, None, None], T1, 1.0)
            img = c1.reshape(B, T, 3, pxr, 128)
            Ti = T1.reshape(B, T, 1, pxr, 128)
            wimg = jax.lax.broadcasted_iota(jnp.float32, img.shape, 1) * 1e-6
            return jnp.sum(img * (1.0 + wimg)) + jnp.sum(Ti)
        all_tiles = jnp.arange(G, dtype=jnp.int32)
        S = int(G * frac)
        hv = jax.lax.top_k(ctx.full_counts, S)[1].astype(jnp.int32)
        if skip == "gather":
            s = jnp.sum(ctx.sorted_vals) * jnp.float32(1e-12)
            pb = jnp.broadcast_to(ctx.packed[:Kb][None], (G, Kb, 16)) + s
            cb = jnp.full((G,), Kb, jnp.int32)
            ph = jnp.broadcast_to(ctx.packed[:Kh][None], (S, Kh, 16)) + s
            ch = jnp.full((S,), Kh, jnp.int32)
        else:
            fl = bool(args.gather_flat)
            if args.scatter_nop:
                def make_gat(sel, k0, K):
                    @jax.custom_vjp
                    def gat(packed):
                        c = rt.BinContext(ctx.offsets, ctx.sorted_vals, packed,
                                          ctx.full_counts, ctx.m_dropped)
                        return rt._gather_tile_params(c, sel, k0, K)

                    def gat_fwd(packed):
                        return gat(packed), packed.shape

                    def gat_bwd(shape, cot):
                        g, _ = cot
                        # consumes every grad element, produces the right
                        # shape, NO scatter — grads are WRONG (timing only)
                        fake = jnp.broadcast_to(
                            jnp.mean(g, axis=(0, 1))[None], shape) * 1e-6
                        return (fake,)

                    gat.defvjp(gat_fwd, gat_bwd)
                    return gat

                pb, cb = make_gat(all_tiles, 0, Kb)(ctx.packed)
                ph, ch = make_gat(hv, Kb, Kh)(ctx.packed)
            elif args.gather_window:
                wtbl = rt._window_table(ctx, pad_rows=Kb + Kh)
                pb, cb = rt._window_tile_params(ctx, wtbl, all_tiles, 0, Kb)
                ph, ch = rt._window_tile_params(ctx, wtbl, hv, Kb, Kh)
            else:
                pb, cb = rt._gather_tile_params(ctx, all_tiles, 0, Kb, flat=fl)
                ph, ch = rt._gather_tile_params(ctx, hv, Kb, Kh, flat=fl)
        if skip == "blend":
            color_t = jnp.mean(pb, axis=(1, 2))[:, None, None, None] \
                + jnp.zeros((G, 3, pxr, 128))
            fT = jnp.zeros((G, pxr, 128)) + jnp.sum(ph) * 1e-12
            return jnp.sum(color_t) + jnp.sum(fT)
        blend = rt._make_pallas_blend(txn, ts, Kb, False, "float32",
                                      bool(args.blend_vec))
        c1, T1, nc1, d1 = blend(pb, cb, all_tiles % T)
        blend_h = rt._make_pallas_blend(txn, ts, Kh, False, "float32",
                                        bool(args.blend_vec))
        c2, T2, nc2, d2 = blend_h(ph, ch, hv % T)
        gate = 1.0 - jax.lax.stop_gradient(d1[hv])
        c1h = c1[hv]
        T1h = T1[hv]
        c1 = c1.at[hv].set(c1h + (T1h * gate)[:, None] * c2)
        T1 = T1.at[hv].set(jnp.where(gate > 0, T1h * T2, T1h))
        img = c1.reshape(B, T, 3, pxr, 128)
        Ti = T1.reshape(B, T, 1, pxr, 128)
        # order-dependent consumer: weighted sum (plain sum would let XLA
        # delete the sort)
        wimg = jax.lax.broadcasted_iota(jnp.float32, img.shape, 1) * 1e-6
        return jnp.sum(img * (1.0 + wimg)) + jnp.sum(Ti)

    variants = ["full", "front", "bin", "gather", "blend"]
    if args.only:
        variants = [v for v in variants if v == args.only]
    results = {}
    for name in variants:
        skip = None if name == "full" else name
        f = functools.partial(pipeline, skip=skip)
        if args.grad:
            f = jax.grad(lambda p, b: pipeline(p, b, skip=skip))
            run = jax.jit(lambda p, b: f(p, b)["pose_embedding"])
        else:
            run = jax.jit(f)
        t0 = time.perf_counter()
        jax.block_until_ready(run(state.params, batch_for(0)))
        print(f"compiled {name} in {time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        out = None
        for r in range(args.rounds):
            out = run(state.params, batch_for(r % NF))
        # force a device->host scalar fetch: through the axon tunnel,
        # block_until_ready can return before the queue drains (measured:
        # chained matmuls "finish" faster than one), while a value fetch
        # cannot — the one extra roundtrip amortizes over the rounds
        float(jnp.sum(out))
        results[name] = (time.perf_counter() - t0) / args.rounds * 1e3

    mode = "fwd+bwd" if args.grad else "fwd"
    print(f"\n[{mode} B={B} @{H}^2, tiers {Kb}+{Kh}@{frac}, "
          f"M={M}, stable={stable}, gather_flat={args.gather_flat}, "
          f"blend_vec={args.blend_vec}]")
    full = results.get("full")
    for name, ms in results.items():
        if name == "full" or full is None:
            print(f"{name}: {ms:.2f} ms")
        else:
            print(f"{name}: {ms:.2f} ms -> piece ~{full - ms:.2f} ms")


if __name__ == "__main__":
    main()
