"""Ablation bench for the vectorized ragged blend BACKWARD kernel.

The round-5 prefix decomposition (scripts/ragged_profile.py,
docs/ragged_profile_r5_vectheta.log) attributes ~18.5 ms of the 50 ms
canonical raster fwd+bwd to the blend backward alone (full 50.2 - gather
prefix 29.1 - blend fwd 2.6) -- 7x its own forward on the same chunk grid
with the same table DMA traffic, i.e. the cost is in-kernel VPU work. This
script times the fwd and bwd pallas_calls standalone on canonical-shape
synthetic chunk streams and then ablates the bwd chunk math piece by piece
(each variant is a local clone of blend_vec.vec_bwd_chunk with one piece
stubbed -- deliberately WRONG math, correct shapes/dependencies):

  full       the production kernel (ops/blend_vec.vec_bwd_chunk)
  nored      the 9 cross-lane (PX->1) reductions replaced by a slice
  nodiv      the 3 (CB, PX) divisions replaced by multiplies
  noscan     suffix cumprod/cumsum scans replaced by their inputs
  noalpha    alpha re-evaluation (exp) fed from a cheap linear proxy
  momred     candidate optimization: reductions as 2 MXU matmuls against
             the pixel monomial basis [1,x,y,x^2,xy,y^2] / gimg rows,
             divisions shared through reciprocals (see vec_bwd_chunk_mxu)

Synthetic stream: every tile filled to budget with low-opacity rows
(alpha ~ 0.01 so no early termination -- the need-table training regime,
all rows contributing; matches the regime blend_vec was measured in).

Run on the real chip:
    python scripts/blend_bwd_bench.py --tiles 512 --budget 576
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=512,
                    help="G = B*n_tiles; canonical 512^2 @ ts=32, B=2 -> 512")
    ap.add_argument("--budget", type=int, default=576)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--ts", type=int, default=32)
    ap.add_argument("--txn", type=int, default=16)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gaussianavatar_tpu.ops import rasterize_ragged as rr
    from gaussianavatar_tpu.ops import blend_vec as bv

    G, CB, ts, txn = args.tiles, args.chunk, args.ts, args.txn
    PX = ts * ts
    C = rr.chunk_slab(G, args.budget, CB)
    # Distribute the C chunks over tiles exactly like a ragged stream whose
    # need is uniform: the first (C mod G) tiles get q+1 chunks, the rest q.
    q, r = divmod(C, G)
    chunks_per_tile = np.full(G, q, np.int32)
    chunks_per_tile[:r] += 1
    rows_per_tile = int(np.mean(chunks_per_tile)) * CB

    rng = np.random.default_rng(0)
    # rows clustered near their tile center, gentle conics, low opacity
    tloc = np.arange(G, dtype=np.int32) % (txn * txn)
    tx = (tloc % txn) * ts + ts / 2
    ty = (tloc // txn) * ts + ts / 2
    ct = np.repeat(np.arange(G, dtype=np.int32), chunks_per_tile)
    k0 = np.concatenate([np.arange(n, dtype=np.int32) * CB
                         for n in chunks_per_tile])
    last = np.concatenate([
        (np.arange(n) == n - 1).astype(np.int32) for n in chunks_per_tile])
    caps = chunks_per_tile * CB

    R = C * CB
    table = np.zeros((R, 16), np.float32)
    tci = np.repeat(ct, CB)
    table[:, 0] = tx[tci] + rng.normal(0, 6, R)       # mean x
    table[:, 1] = ty[tci] + rng.normal(0, 6, R)       # mean y
    table[:, 2] = 0.02 + rng.random(R) * 0.02          # conic a
    table[:, 3] = rng.normal(0, 0.002, R)              # conic b
    table[:, 4] = 0.02 + rng.random(R) * 0.02          # conic c
    table[:, 5:8] = rng.random((R, 3))                 # color
    table[:, 8] = 0.01                                  # opacity: no termination
    table[:, 9] = 1.0                                   # valid
    table = jnp.asarray(table.reshape(C, CB, 16))
    caps, ct, k0, last, tloc = map(jnp.asarray, (caps, ct, k0, last, tloc))

    fwd = jax.jit(functools.partial(
        rr._ragged_fwd, G=G, CB=CB, ts=ts, txn=txn, interpret=False, vec=True))
    color, finalT, ncon, done = jax.block_until_ready(
        fwd(table, caps, ct, k0, tloc))
    maxn = jnp.max(ncon.reshape(G, -1), axis=1).astype(jnp.int32)
    gimg = jnp.asarray(rng.normal(0, 1, color.shape).astype(np.float32))
    gfT = jnp.asarray(rng.normal(0, 1, finalT.shape).astype(np.float32))
    print(f"C={C} chunks of ({CB},{PX}); rows/tile={rows_per_tile}; "
          f"mean ncon={float(jnp.mean(ncon)):.0f} (want ~{rows_per_tile})",
          flush=True)

    def timed(f, *a):
        out = jax.block_until_ready(f(*a))
        t0 = time.time()
        for _ in range(args.iters):
            out = f(*a)
        jax.block_until_ready(out)
        return (time.time() - t0) / args.iters * 1e3, out

    ms_fwd, _ = timed(fwd, table, caps, ct, k0, tloc)

    # ---- bwd variants ------------------------------------------------
    def make_bwd(chunk_fn):
        def kernel(ct_ref, k0_ref, last_ref, caps_ref, tloc_ref, maxn_ref,
                   table_ref, finalT_ref, ncon_ref, gimg_ref, gfT_ref,
                   grads_ref, T_sc, E_sc):
            rc = C - 1 - pl.program_id(0)
            t = ct_ref[rc]
            kk0 = k0_ref[rc]
            tile = tloc_ref[t]
            txi = tile % txn
            tyi = tile // txn
            f = jax.lax.broadcasted_iota(jnp.int32, (1, PX), 1)
            px = (txi * ts + f % ts).astype(jnp.float32)
            py = (tyi * ts + f // ts).astype(jnp.float32)
            grads_ref[0, :, :] = jnp.zeros((CB, 16), jnp.float32)

            @pl.when((kk0 >= 0) & (last_ref[rc] == 1))
            def _init():
                T_sc[...] = finalT_ref[0]
                E_sc[...] = jnp.zeros((1, PX), jnp.float32)

            mx = maxn_ref[t]

            @pl.when((kk0 >= 0) & (kk0 < mx))
            def _acc():
                count = caps_ref[t]
                block, T, E = chunk_fn(
                    table_ref[0], px, py, kk0, count, ncon_ref[0],
                    finalT_ref[0], gimg_ref[0, 0], gimg_ref[0, 1],
                    gimg_ref[0, 2], gfT_ref[0], T_sc[...], E_sc[...])
                grads_ref[0, :, :] = block
                T_sc[...] = T
                E_sc[...] = E

        rev_tbl = lambda c, *s: (C - 1 - c, 0, 0)
        rev_t3 = lambda c, ct, *s: (ct[C - 1 - c], 0, 0)
        rev_t4 = lambda c, ct, *s: (ct[C - 1 - c], 0, 0, 0)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6, grid=(C,),
            in_specs=[
                pl.BlockSpec((1, CB, 16), rev_tbl),
                pl.BlockSpec((1, 1, PX), rev_t3),
                pl.BlockSpec((1, 1, PX), rev_t3),
                pl.BlockSpec((1, 3, 1, PX), rev_t4),
                pl.BlockSpec((1, 1, PX), rev_t3),
            ],
            out_specs=pl.BlockSpec((1, CB, 16), rev_tbl),
            scratch_shapes=[pltpu.VMEM((1, PX), jnp.float32)] * 2,
        )
        call = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((C, CB, 16), jnp.float32))
        return jax.jit(lambda *a: call(*a))

    one = jnp.float32(1.0)

    def v_nored(p, px, py, k0_, count, ncon_, finalT_, gr, gg, gb, gfT_, Tc, Ec):
        dx, dy, gval, alpha, live, k = bv._alpha_eval(p, px, py, k0_, count)
        m = live & (k < ncon_)
        fac = jnp.where(m, 1.0 - alpha, 1.0)
        P = bv._inclusive_suffix_cumprod(fac)
        Tn = Tc / P
        colg = p[:, 5:6] * gr + p[:, 6:7] * gg + p[:, 7:8] * gb
        wT = jnp.where(m, alpha * Tn, 0.0)
        e = wT * colg
        E = bv._exclusive_suffix_cumsum(e) + Ec
        one_m = 1.0 - alpha
        dalpha = Tn * colg - E / one_m - (finalT_ / one_m) * gfT_
        dalpha = jnp.where(m, dalpha, 0.0)
        dpow = gval * p[:, 8:9] * dalpha
        # ABLATION: slice instead of the 9 (PX->1) reductions
        block = dpow[:, :16] + wT[:, :16] + dx[:, :16] + dy[:, :16]
        return block, Tc / P[0:1], Ec + jnp.sum(e, axis=0, keepdims=True)

    def v_nodiv(p, px, py, k0_, count, ncon_, finalT_, gr, gg, gb, gfT_, Tc, Ec):
        dx, dy, gval, alpha, live, k = bv._alpha_eval(p, px, py, k0_, count)
        m = live & (k < ncon_)
        fac = jnp.where(m, 1.0 - alpha, 1.0)
        P = bv._inclusive_suffix_cumprod(fac)
        Tn = Tc * P                                   # ABLATION: mul not div
        colg = p[:, 5:6] * gr + p[:, 6:7] * gg + p[:, 7:8] * gb
        wT = jnp.where(m, alpha * Tn, 0.0)
        e = wT * colg
        E = bv._exclusive_suffix_cumsum(e) + Ec
        one_m = 1.0 - alpha
        dalpha = Tn * colg - E * one_m - (finalT_ * one_m) * gfT_
        dalpha = jnp.where(m, dalpha, 0.0)
        dpow = gval * p[:, 8:9] * dalpha
        ca, cb_, cc = p[:, 2:3], p[:, 3:4], p[:, 4:5]
        red = lambda x: jnp.sum(x, axis=1, keepdims=True)
        block = jnp.concatenate([
            red(dpow * (ca * dx + cb_ * dy)), red(dpow * (cb_ * dx + cc * dy)),
            red(-0.5 * dx * dx * dpow), red(-dx * dy * dpow),
            red(-0.5 * dy * dy * dpow), red(wT * gr), red(wT * gg),
            red(wT * gb), red(gval * dalpha),
            jnp.zeros((p.shape[0], 7), jnp.float32)], axis=1)
        return block, Tc * P[0:1], Ec + jnp.sum(e, axis=0, keepdims=True)

    def v_noscan(p, px, py, k0_, count, ncon_, finalT_, gr, gg, gb, gfT_, Tc, Ec):
        dx, dy, gval, alpha, live, k = bv._alpha_eval(p, px, py, k0_, count)
        m = live & (k < ncon_)
        fac = jnp.where(m, 1.0 - alpha, 1.0)
        P = fac                                       # ABLATION: no suffix scans
        Tn = Tc / P
        colg = p[:, 5:6] * gr + p[:, 6:7] * gg + p[:, 7:8] * gb
        wT = jnp.where(m, alpha * Tn, 0.0)
        e = wT * colg
        E = e + Ec
        one_m = 1.0 - alpha
        dalpha = Tn * colg - E / one_m - (finalT_ / one_m) * gfT_
        dalpha = jnp.where(m, dalpha, 0.0)
        dpow = gval * p[:, 8:9] * dalpha
        ca, cb_, cc = p[:, 2:3], p[:, 3:4], p[:, 4:5]
        red = lambda x: jnp.sum(x, axis=1, keepdims=True)
        block = jnp.concatenate([
            red(dpow * (ca * dx + cb_ * dy)), red(dpow * (cb_ * dx + cc * dy)),
            red(-0.5 * dx * dx * dpow), red(-dx * dy * dpow),
            red(-0.5 * dy * dy * dpow), red(wT * gr), red(wT * gg),
            red(wT * gb), red(gval * dalpha),
            jnp.zeros((p.shape[0], 7), jnp.float32)], axis=1)
        return block, Tc / P[0:1], Ec + jnp.sum(e, axis=0, keepdims=True)

    variants = {
        "full": bv.vec_bwd_chunk,
        "nored": v_nored,
        "nodiv": v_nodiv,
        "noscan": v_noscan,
    }
    if hasattr(bv, "vec_bwd_chunk_lean"):
        variants["lean"] = bv.vec_bwd_chunk_lean
    if hasattr(bv, "vec_bwd_chunk_mxu"):
        variants["momred"] = bv.vec_bwd_chunk_mxu
        variants["momred16"] = functools.partial(
            bv.vec_bwd_chunk_mxu, precision=jax.lax.Precision.DEFAULT)

    report = {"C": int(C), "CB": CB, "PX": PX, "fwd_ms": round(ms_fwd, 2)}
    print(f"fwd pallas_call: {ms_fwd:7.2f} ms", flush=True)
    args6 = (ct, k0, last, caps, tloc, maxn, table, finalT, ncon, gimg, gfT)
    ref_out = None
    for name, fn in variants.items():
        call = make_bwd(fn)
        ms, out = timed(call, *args6)
        row = {"ms": round(ms, 2)}
        if name == "full":
            ref_out = out
        elif name in ("lean", "momred", "momred16") and ref_out is not None:
            d = float(jnp.max(jnp.abs(out - ref_out)))
            rel = d / (float(jnp.max(jnp.abs(ref_out))) + 1e-30)
            row["max_abs_diff_vs_full"] = d
            row["rel_diff_vs_full"] = rel
        report[name] = row
        print(f"bwd[{name:7s}]: {ms:7.2f} ms" +
              (f"   maxdiff {row.get('max_abs_diff_vs_full', 0):.3e}"
               f" rel {row.get('rel_diff_vs_full', 0):.3e}"
               if "max_abs_diff_vs_full" in row else ""), flush=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
