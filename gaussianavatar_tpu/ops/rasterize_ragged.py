"""Ragged slot-stream rasterization: per-tile DATA-DEPENDENT blend capacity
under a static chunk budget — the TPU-native analog of the CUDA rasterizer's
per-tile ranges (/root/reference submodule diff-gaussian-rasterization;
consumer at /root/reference/gaussian_renderer/__init__.py:40-48).

Why: the capacity-cascade design (ops/rasterize_tile.rasterize_views_binned)
approximates ragged per-tile loads with nested capacity TIERS handed to
count-ranked tile prefixes. Its gather/DMA cost is the cascade cost — every
tile in a tier pays the full tier capacity — which at the canonical
512²-query training workload runs ~3x the true per-tile needed depth
(BASELINE.md round-3 "saturation-aware auto-cascade": tuned-cascade cost
2184/tile vs a ~700/tile need mean), because (a) tier capacities quantize
coarsely, (b) tiles are ranked by binned count, a weak proxy for need
(Spearman 0.18-0.26), and (c) the ~half of tiles that are EMPTY still pay
the base tier.

Here, every tile gets exactly its own capacity (any per-tile int32 vector —
true binned counts by default, probe-measured needed depths when the caller
has them) and the compiled shape is ONE static number: the total chunk
budget C. The stream of `cap_t`-row tile segments is cut into CB-row chunks;
a Pallas grid runs one step per chunk with scalar-prefetched chunk->tile /
chunk->rank maps driving the block index maps:

  - the parameter table is gathered ONCE into chunk order (C, CB, 16) — a
    row gather of exactly sum(ceil(cap_t/CB))*CB rows (the fast vectorized
    path, see the flat-gather rejection in BASELINE.md),
  - the forward kernel accumulates pixel state (color, T, n_contrib, done)
    in OUTPUT blocks revisited across a tile's consecutive chunks (Pallas
    keeps a block in VMEM while the index map holds still), initializing on
    each tile's first chunk; inner arithmetic is the same 8-unrolled
    early-terminating loop as the cascade kernel, so results are bit-exact
    against it,
  - the backward kernel walks the grid in REVERSE (back-to-front per tile,
    CUDA parity), carrying transmittance/suffix-color accumulators in VMEM
    scratch re-initialized at each tile's LAST chunk, and skips all compute
    for chunks past the tile's max n_contrib (their grads are zero).

Budgeting: capacities are clipped by the largest uniform ceiling theta with
sum(ceil(min(cap, theta)/CB)) <= C (16-step integer bisection, jit-friendly)
— i.e. over budget, the DEEPEST tiles lose their tails first. Truncation is
never silent: overflow = dropped gaussian-tile pairs, same contract as the
cascade path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussianavatar_tpu.ops.rasterize_tile import (
    _CHUNK,
    _LANES,
    _bin_gaussians,
    _cdiv,
    _untile,
)
from gaussianavatar_tpu.ops.rasterize_ref import ALPHA_MAX, ALPHA_MIN, T_EPS
from gaussianavatar_tpu.ops.blend_vec import vec_fwd_chunk
# lean = pass-reduced restructuring of vec_bwd_chunk (same reduction set,
# fewer full-(CB, PX) elementwise passes; float-tolerance-identical).
# Measured v5e canonical shapes: 10.2 vs 10.9 ms standalone bwd
# (scripts/blend_bwd_bench.py, docs/blend_bwd_bench_r5.json).
from gaussianavatar_tpu.ops.blend_vec import vec_bwd_chunk_lean as vec_bwd_chunk

import math


# --------------------------------------------------------------------------
# Chunk bookkeeping (XLA)
# --------------------------------------------------------------------------

def _budget_theta(caps: jax.Array, CB: int, C: int) -> jax.Array:
    """Largest integer ceiling theta such that the chunked stream fits the
    budget: sum(ceil(min(caps, theta)/CB)) <= C.

    Closed vectorized form (no sequential search): ceil(min(c, theta)/CB)
    = min(ceil(theta/CB), ceil(c/CB)) for c, theta >= 0, so the fit sum
    depends on theta only through its chunk level t = ceil(theta/CB):
    f(t) = sum_c min(t, q_c) with q_c = ceil(c/CB). With q sorted and
    prefix-summed, f(t) = P[#(q<t)] + t * #(q>=t) for every candidate
    level t in [0, C] at once (t* <= C always: f(t) >= t while any tile
    is that deep; past max(q), f saturates at sum(q) and theta* is
    max(caps) itself). The previous form — 31-iteration bisection as a
    fori_loop of tiny (G,) reduces — was launch-bound: ~2.5 ms of the
    canonical step (prefix-timed, scripts/ragged_profile.py round 5),
    paid in the render path too. Bit-equal to the host bisection twin
    `budget_theta_host` (fuzz-tested)."""
    caps = caps.astype(jnp.int32)
    G = caps.shape[0]
    q = _cdiv_arr(caps, CB)
    sq = jnp.sort(q)
    P = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(sq, dtype=jnp.int32)])
    t = jnp.arange(C + 1, dtype=jnp.int32)
    i = jnp.searchsorted(sq, t, side="left").astype(jnp.int32)  # #(q < t)
    f = P[i] + t * (jnp.int32(G) - i)
    tstar = jnp.max(jnp.where(f <= C, t, 0))
    hi0 = jnp.max(caps, initial=jnp.int32(0))
    return jnp.minimum(tstar * CB, hi0)


def chunk_slab(G: int, budget: int, CB: int) -> int:
    """Number of CB-row chunks the static `ragged_budget` (avg rows/tile)
    allows for G tiles — the quantized grid size rasterize_views_ragged
    builds (256-chunk steps for program reuse across retunes, 8 below)."""
    C = _cdiv(G * budget, CB)
    return _cdiv(C, 256) * 256 if C >= 256 else _cdiv(C, 8) * 8


def budget_theta_host(caps: "np.ndarray", CB: int, C: int) -> int:
    """Host-side (numpy) twin of `_budget_theta` — same bisection, same
    result (equality fuzz-tested in tests/test_multi_budget_fairness.py).
    Used by retune telemetry to account theta-clipping without a device
    round-trip."""
    import numpy as np

    caps = np.asarray(caps, np.int64)
    lo, hi = 0, int(caps.max(initial=0))
    for _ in range(31):
        mid = (lo + hi + 1) // 2
        if int((-(-np.minimum(caps, mid) // CB)).sum()) <= C:
            lo = mid
        else:
            hi = mid - 1
    return lo


def _cdiv_arr(x, d):
    return -(-x // d)


def _chunk_maps(caps: jax.Array, CB: int, C: int):
    """caps (G,) -> per-chunk maps, all (C,) int32:
    ct   — owning tile (clipped to a valid tile for padding chunks),
    k0   — starting depth rank within the tile (-1 for padding chunks),
    last — 1 on each tile's final chunk (backward scratch re-init)."""
    G = caps.shape[0]
    nchunks = _cdiv_arr(caps, CB)
    aoff = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(nchunks).astype(jnp.int32)]
    )  # (G+1,)
    total = aoff[-1]
    cidx = jnp.arange(C, dtype=jnp.int32)
    ct = jnp.clip(
        jnp.searchsorted(aoff, cidx, side="right").astype(jnp.int32) - 1, 0, G - 1
    )
    within = cidx - aoff[ct]
    valid = cidx < total
    k0 = jnp.where(valid, within * CB, jnp.int32(-1))
    last = (valid & (within == nchunks[ct] - 1)).astype(jnp.int32)
    return ct, k0, last


# --------------------------------------------------------------------------
# Pallas kernels
# --------------------------------------------------------------------------

def _ragged_fwd_kernel(
    ct_ref, k0_ref, caps_ref, tloc_ref,   # scalar prefetch
    table_ref,                             # (1, CB, 16) VMEM block
    color_ref, T_ref, ncon_ref, done_ref,  # outputs, revisited per tile
    *, CB, ts, txn,
):
    pxr = ts * ts // _LANES
    c = pl.program_id(0)
    t = ct_ref[c]
    k0 = k0_ref[c]
    tile = tloc_ref[t]
    tx = tile % txn
    ty = tile // txn
    f = (
        jax.lax.broadcasted_iota(jnp.int32, (pxr, _LANES), 0) * _LANES
        + jax.lax.broadcasted_iota(jnp.int32, (pxr, _LANES), 1)
    )
    px = (tx * ts + f % ts).astype(jnp.float32)
    py = (ty * ts + f // ts).astype(jnp.float32)

    @pl.when(k0 == 0)
    def _init():
        zero = jnp.zeros((pxr, _LANES), jnp.float32)
        color_ref[0, 0] = zero
        color_ref[0, 1] = zero
        color_ref[0, 2] = zero
        T_ref[0] = jnp.ones((pxr, _LANES), jnp.float32)
        ncon_ref[0] = jnp.zeros((pxr, _LANES), jnp.int32)
        done_ref[0] = zero

    @pl.when(k0 >= 0)
    def _acc():
        count = caps_ref[t]
        nsub = pl.cdiv(jnp.clip(count - k0, 0, CB), _CHUNK)

        def body(st):
            ci, T, cr, cg, cb, done, ncon = st
            s0 = ci * _CHUNK
            p = table_ref[0, pl.ds(s0, _CHUNK), :]  # (_CHUNK, 16)
            for g in range(_CHUNK):
                k = k0 + s0 + g  # absolute depth rank within the tile
                dx = px - p[g, 0]
                dy = py - p[g, 1]
                ca, cb_, cc = p[g, 2], p[g, 3], p[g, 4]
                power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb_ * dx * dy
                gval = jnp.exp(power)
                alpha = jnp.minimum(p[g, 8] * gval, ALPHA_MAX)
                ok = (p[g, 9] > 0) & (k < count)
                live = ok & (power <= 0.0) & (alpha >= ALPHA_MIN)
                test_T = T * (1.0 - alpha)
                trig = live & (test_T < T_EPS)
                done = jnp.maximum(done, trig.astype(jnp.float32))
                m = live & (done == 0.0)
                w = jnp.where(m, alpha * T, 0.0)
                cr = cr + w * p[g, 5]
                cg = cg + w * p[g, 6]
                cb = cb + w * p[g, 7]
                T = jnp.where(m, test_T, T)
                ncon = jnp.where(m, k + 1, ncon)
            return (ci + 1, T, cr, cg, cb, done, ncon)

        def cond(st):
            ci = st[0]
            done = st[5]
            return (ci < nsub) & (jnp.min(done) < 1.0)

        init = (
            jnp.int32(0),
            T_ref[0],
            color_ref[0, 0],
            color_ref[0, 1],
            color_ref[0, 2],
            done_ref[0],
            ncon_ref[0],
        )
        _, T, cr, cg, cb, done, ncon = jax.lax.while_loop(cond, body, init)
        color_ref[0, 0] = cr
        color_ref[0, 1] = cg
        color_ref[0, 2] = cb
        T_ref[0] = T
        done_ref[0] = done
        ncon_ref[0] = ncon


def _ragged_bwd_kernel(
    ct_ref, k0_ref, last_ref, caps_ref, tloc_ref, maxn_ref,  # scalar prefetch
    table_ref, finalT_ref, ncon_ref, gimg_ref, gfT_ref,      # inputs
    grads_ref,                                               # (1, CB, 16) per chunk
    T_sc, ar_sc, ag_sc, ab_sc,                               # VMEM scratch
    *, CB, C, ts, txn,
):
    pxr = ts * ts // _LANES
    rc = C - 1 - pl.program_id(0)  # walk chunks in reverse
    t = ct_ref[rc]
    k0 = k0_ref[rc]
    tile = tloc_ref[t]
    tx = tile % txn
    ty = tile // txn
    f = (
        jax.lax.broadcasted_iota(jnp.int32, (pxr, _LANES), 0) * _LANES
        + jax.lax.broadcasted_iota(jnp.int32, (pxr, _LANES), 1)
    )
    px = (tx * ts + f % ts).astype(jnp.float32)
    py = (ty * ts + f // ts).astype(jnp.float32)

    grads_ref[0, :, :] = jnp.zeros((CB, 16), jnp.float32)

    @pl.when((k0 >= 0) & (last_ref[rc] == 1))
    def _init():
        # entering a new tile (reverse order): T starts at the tile's final
        # transmittance, suffix-color accumulators at zero
        T_sc[...] = finalT_ref[0]
        zero = jnp.zeros((pxr, _LANES), jnp.float32)
        ar_sc[...] = zero
        ag_sc[...] = zero
        ab_sc[...] = zero

    maxn = maxn_ref[t]

    @pl.when((k0 >= 0) & (k0 < maxn))
    def _acc():
        count = caps_ref[t]
        finalT = finalT_ref[0]
        ncon = ncon_ref[0]
        gr = gimg_ref[0, 0]
        gg = gimg_ref[0, 1]
        gb = gimg_ref[0, 2]
        gfT = gfT_ref[0]
        # ranks past the tile's deepest contributor have zero grads: only
        # cdiv(min(maxn, count) - k0, CHUNK) sub-chunks carry signal
        nsub = pl.cdiv(jnp.clip(jnp.minimum(maxn, count) - k0, 0, CB), _CHUNK)

        def body(i, st):
            T, ar, ag, ab = st
            ci = nsub - 1 - i
            s0 = ci * _CHUNK
            p = table_ref[0, pl.ds(s0, _CHUNK), :]
            integrands = [None] * _CHUNK
            for g in range(_CHUNK - 1, -1, -1):
                k = k0 + s0 + g
                dx = px - p[g, 0]
                dy = py - p[g, 1]
                ca, cb_, cc = p[g, 2], p[g, 3], p[g, 4]
                colr, colg, colb = p[g, 5], p[g, 6], p[g, 7]
                op = p[g, 8]
                power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb_ * dx * dy
                gval = jnp.exp(power)
                alpha = jnp.minimum(op * gval, ALPHA_MAX)
                ok = (p[g, 9] > 0) & (k < count)
                m = ok & (power <= 0.0) & (alpha >= ALPHA_MIN) & (k < ncon)
                one_m = 1.0 - alpha
                Tn = jnp.where(m, T / one_m, T)
                wT = jnp.where(m, alpha * Tn, 0.0)
                dalpha = ((colr - ar) * gr + (colg - ag) * gg + (colb - ab) * gb) * Tn
                dalpha = dalpha + (-finalT / one_m) * gfT
                dalpha = jnp.where(m, dalpha, 0.0)
                ar = jnp.where(m, alpha * colr + one_m * ar, ar)
                ag = jnp.where(m, alpha * colg + one_m * ag, ag)
                ab = jnp.where(m, alpha * colb + one_m * ab, ab)
                dpow = gval * op * dalpha
                srow = lambda x: jnp.sum(x, axis=0, keepdims=True)
                integrands[g] = [
                    srow(dpow * (ca * dx + cb_ * dy)),
                    srow(dpow * (cb_ * dx + cc * dy)),
                    srow(-0.5 * dx * dx * dpow),
                    srow(-dx * dy * dpow),
                    srow(-0.5 * dy * dy * dpow),
                    srow(wT * gr),
                    srow(wT * gg),
                    srow(wT * gb),
                    srow(gval * dalpha),
                ]
                T = Tn
            flat = [arr for per_g in integrands for arr in per_g]
            stacked = jnp.concatenate(flat, axis=0)
            sums = jnp.sum(stacked, axis=1)
            block = jnp.concatenate(
                [sums.reshape(_CHUNK, 9), jnp.zeros((_CHUNK, 7), jnp.float32)],
                axis=1,
            )
            grads_ref[0, pl.ds(s0, _CHUNK), :] = block
            return (T, ar, ag, ab)

        T, ar, ag, ab = jax.lax.fori_loop(
            0, nsub, body, (T_sc[...], ar_sc[...], ag_sc[...], ab_sc[...])
        )
        T_sc[...] = T
        ar_sc[...] = ar
        ag_sc[...] = ag
        ab_sc[...] = ab


# --------------------------------------------------------------------------
# Row-vectorized kernels (ops/blend_vec): whole-chunk (CB, PX) arithmetic,
# transmittance via a log2(CB)-step scan. Same gating semantics, float-
# tolerance (not bit-exact) vs the sequential kernels above; selected by
# RasterParams.blend_vec. Pixel state lives as (1, PX) lane rows.
# --------------------------------------------------------------------------

def _ragged_fwd_kernel_vec(
    ct_ref, k0_ref, caps_ref, tloc_ref,    # scalar prefetch
    table_ref,                              # (1, CB, 16) VMEM block
    color_ref, T_ref, ncon_ref, done_ref,   # outputs, revisited per tile
    *, CB, ts, txn,
):
    PX = ts * ts
    c = pl.program_id(0)
    t = ct_ref[c]
    k0 = k0_ref[c]
    tile = tloc_ref[t]
    tx = tile % txn
    ty = tile // txn
    f = jax.lax.broadcasted_iota(jnp.int32, (1, PX), 1)
    px = (tx * ts + f % ts).astype(jnp.float32)
    py = (ty * ts + f // ts).astype(jnp.float32)

    @pl.when(k0 == 0)
    def _init():
        zero = jnp.zeros((1, PX), jnp.float32)
        color_ref[0, 0] = zero
        color_ref[0, 1] = zero
        color_ref[0, 2] = zero
        T_ref[0] = jnp.ones((1, PX), jnp.float32)
        ncon_ref[0] = jnp.zeros((1, PX), jnp.int32)
        done_ref[0] = zero

    done_in = done_ref[0]

    @pl.when((k0 >= 0) & (jnp.min(done_in) < 1.0))
    def _acc():
        count = caps_ref[t]
        dcr, dcg, dcb, T, done, ncon = vec_fwd_chunk(
            table_ref[0], px, py, k0, count, T_ref[0], done_in, ncon_ref[0]
        )
        color_ref[0, 0] = color_ref[0, 0] + dcr
        color_ref[0, 1] = color_ref[0, 1] + dcg
        color_ref[0, 2] = color_ref[0, 2] + dcb
        T_ref[0] = T
        done_ref[0] = done
        ncon_ref[0] = ncon


def _ragged_bwd_kernel_vec(
    ct_ref, k0_ref, last_ref, caps_ref, tloc_ref, maxn_ref,  # scalar prefetch
    table_ref, finalT_ref, ncon_ref, gimg_ref, gfT_ref,      # inputs
    grads_ref,                                               # (1, CB, 16) per chunk
    T_sc, E_sc,                                              # VMEM scratch (1, PX)
    *, CB, C, ts, txn,
):
    PX = ts * ts
    rc = C - 1 - pl.program_id(0)  # walk chunks in reverse
    t = ct_ref[rc]
    k0 = k0_ref[rc]
    tile = tloc_ref[t]
    tx = tile % txn
    ty = tile // txn
    f = jax.lax.broadcasted_iota(jnp.int32, (1, PX), 1)
    px = (tx * ts + f % ts).astype(jnp.float32)
    py = (ty * ts + f // ts).astype(jnp.float32)

    grads_ref[0, :, :] = jnp.zeros((CB, 16), jnp.float32)

    @pl.when((k0 >= 0) & (last_ref[rc] == 1))
    def _init():
        T_sc[...] = finalT_ref[0]
        E_sc[...] = jnp.zeros((1, PX), jnp.float32)

    maxn = maxn_ref[t]

    @pl.when((k0 >= 0) & (k0 < maxn))
    def _acc():
        count = caps_ref[t]
        block, T, E = vec_bwd_chunk(
            table_ref[0], px, py, k0, count, ncon_ref[0], finalT_ref[0],
            gimg_ref[0, 0], gimg_ref[0, 1], gimg_ref[0, 2], gfT_ref[0],
            T_sc[...], E_sc[...],
        )
        grads_ref[0, :, :] = block
        T_sc[...] = T
        E_sc[...] = E


# --------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# --------------------------------------------------------------------------

def _ragged_fwd(table, caps, ct, k0, tloc, *, G, CB, ts, txn, interpret, vec):
    C = table.shape[0]
    if vec:
        pxr, lanes = 1, ts * ts   # pixel state as one (1, ts*ts) lane row
        kernel = functools.partial(_ragged_fwd_kernel_vec, CB=CB, ts=ts, txn=txn)
    else:
        pxr, lanes = ts * ts // _LANES, _LANES
        kernel = functools.partial(_ragged_fwd_kernel, CB=CB, ts=ts, txn=txn)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, CB, 16), lambda c, ct, k0, caps, tloc: (c, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, pxr, lanes),
                         lambda c, ct, k0, caps, tloc: (ct[c], 0, 0, 0)),
            pl.BlockSpec((1, pxr, lanes),
                         lambda c, ct, k0, caps, tloc: (ct[c], 0, 0)),
            pl.BlockSpec((1, pxr, lanes),
                         lambda c, ct, k0, caps, tloc: (ct[c], 0, 0)),
            pl.BlockSpec((1, pxr, lanes),
                         lambda c, ct, k0, caps, tloc: (ct[c], 0, 0)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((G, 3, pxr, lanes), jnp.float32),
            jax.ShapeDtypeStruct((G, pxr, lanes), jnp.float32),
            jax.ShapeDtypeStruct((G, pxr, lanes), jnp.int32),
            jax.ShapeDtypeStruct((G, pxr, lanes), jnp.float32),
        ],
        interpret=interpret,
    )(ct, k0, caps, tloc, table)


def _ragged_bwd(table, caps, ct, k0, last, tloc, maxn, finalT, ncon, gimg, gfT,
                *, CB, ts, txn, interpret, vec):
    C = table.shape[0]
    if vec:
        pxr, lanes = 1, ts * ts
        kernel = functools.partial(
            _ragged_bwd_kernel_vec, CB=CB, C=C, ts=ts, txn=txn)
        scratch = [pltpu.VMEM((1, ts * ts), jnp.float32)] * 2   # T, E carries
    else:
        pxr, lanes = ts * ts // _LANES, _LANES
        kernel = functools.partial(_ragged_bwd_kernel, CB=CB, C=C, ts=ts, txn=txn)
        scratch = [pltpu.VMEM((pxr, _LANES), jnp.float32)] * 4
    rev_tbl = lambda c, ct, k0, last, caps, tloc, maxn: (C - 1 - c, 0, 0)
    rev_tile3 = lambda c, ct, k0, last, caps, tloc, maxn: (ct[C - 1 - c], 0, 0)
    rev_tile4 = lambda c, ct, k0, last, caps, tloc, maxn: (ct[C - 1 - c], 0, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, CB, 16), rev_tbl),
            pl.BlockSpec((1, pxr, lanes), rev_tile3),   # finalT
            pl.BlockSpec((1, pxr, lanes), rev_tile3),   # ncon
            pl.BlockSpec((1, 3, pxr, lanes), rev_tile4),  # gimg
            pl.BlockSpec((1, pxr, lanes), rev_tile3),   # gfT
        ],
        out_specs=pl.BlockSpec((1, CB, 16), rev_tbl),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(table.shape, jnp.float32),
        interpret=interpret,
    )(ct, k0, last, caps, tloc, maxn, table, finalT, ncon, gimg, gfT)


@functools.lru_cache(maxsize=32)
def _make_ragged_blend(txn: int, ts: int, G: int, CB: int, interpret: bool,
                       vec: bool = False):
    """custom-VJP ragged blend: table (C, CB, 16) in chunk-stream order +
    scalar chunk maps -> per-tile (color, finalT, ncon, done). Tiles with
    zero capacity are never visited — their output blocks are UNDEFINED;
    the caller masks them (`caps > 0`)."""

    @jax.custom_vjp
    def blend(table, caps, ct, k0, last, tloc):
        return _ragged_fwd(table, caps, ct, k0, tloc,
                           G=G, CB=CB, ts=ts, txn=txn, interpret=interpret,
                           vec=vec)

    def blend_fwd(table, caps, ct, k0, last, tloc):
        out = _ragged_fwd(table, caps, ct, k0, tloc,
                          G=G, CB=CB, ts=ts, txn=txn, interpret=interpret,
                          vec=vec)
        color, finalT, ncon, done = out
        return out, (table, caps, ct, k0, last, tloc, finalT, ncon)

    def blend_bwd(res, cot):
        table, caps, ct, k0, last, tloc, finalT, ncon = res
        gimg, gfT, _, _ = cot
        # per-tile deepest contributor: bounds the reverse traversal; chunks
        # past it carry zero gradient and skip all compute
        maxn = jnp.max(ncon.reshape(ncon.shape[0], -1), axis=1).astype(jnp.int32)
        grads = _ragged_bwd(table, caps, ct, k0, last, tloc, maxn,
                            finalT, ncon, gimg, gfT,
                            CB=CB, ts=ts, txn=txn, interpret=interpret, vec=vec)
        return grads, None, None, None, None, None

    blend.defvjp(blend_fwd, blend_bwd)
    return blend


# --------------------------------------------------------------------------
# Public entry
# --------------------------------------------------------------------------

def rasterize_views_ragged(
    projs,                # ProjectedGaussians, batched (B, N, ...)
    colors: jax.Array,    # (B, N, 3)
    opacities: jax.Array, # (B, N) or (B, N, 1)
    bg: jax.Array,        # (3,)
    height: int,
    width: int,
    config,
    caps: jax.Array | None = None,  # (B*T,) per-tile capacity; None = true counts
) -> Tuple[jax.Array, jax.Array]:
    """Render a batch of views with per-tile ragged capacities ->
    ((B, 3, H, W) image, () int32 overflow). Config knobs:

      ragged_chunk  — CB, rows per grid step (default 128). Smaller = less
                      tail quantization, more grid steps.
      ragged_budget — average rows per tile the static chunk budget allows
                      (comparable to the cascade-cost scale, e.g. the tuned
                      512-query cascade costs 2184). 0 (default) = size for
                      the worst case (every binned pair, sum = B*N*M rows).

    `caps` callers: pass probe-measured needed depths (min'd with true
    counts here) to pay only for ranks that contribute — e.g. a per-frame
    need table maintained at checkpoint boundaries. Truncation (budget or
    caps) is never silent: overflow counts every dropped pair."""
    ts = config.tile_size
    M = config.max_tiles_per_gaussian
    MW = MH = int(math.isqrt(M))
    assert MW * MH == M, "max_tiles_per_gaussian must be a perfect square"
    assert (ts * ts) % _LANES == 0, "tile_size^2 must be a multiple of 128"
    CB = int(getattr(config, "ragged_chunk", 128) or 128)
    assert CB % _CHUNK == 0, "ragged_chunk must be a multiple of 8"

    B, N = colors.shape[0], colors.shape[1]
    txn, tyn = _cdiv(width, ts), _cdiv(height, ts)
    n_tiles = txn * tyn
    G = B * n_tiles

    ctx = _bin_gaussians(
        projs, colors, opacities.reshape(B, N), height, width, ts, MW, MH,
        stable=bool(getattr(config, "sort_stable", True)),
    )

    budget = int(getattr(config, "ragged_budget", 0) or 0)
    if budget > 0:
        C = chunk_slab(G, budget, CB)
    else:
        # worst case: every pair + per-tile tail; same grid quantization
        C = _cdiv(B * N * M, CB) + G
        C = _cdiv(C, 256) * 256 if C >= 256 else _cdiv(C, 8) * 8

    caps_raw = ctx.full_counts if caps is None else jnp.minimum(
        caps.astype(jnp.int32), ctx.full_counts)
    theta = _budget_theta(caps_raw, CB, C)
    caps_eff = jnp.minimum(caps_raw, theta)
    ct, k0, last = _chunk_maps(caps_eff, CB, C)

    # one aligned gather into chunk-stream order: (C*CB, 16). No validity
    # masking here: rows past a tile's cap (chunk tail) or in padding chunks
    # carry a NEIGHBORING segment's params, but the kernels gate every such
    # row off with `k < count` (fwd `ok`, bwd `m` — grads for gated rows are
    # exactly zero), and segments themselves contain only valid entries
    # (invalid slots key to int32max, past every tile boundary). Masking
    # again in XLA would add a (C*CB,) bool build + a 64 MB-scale
    # elementwise pass for bit-identical results
    # (tests/test_rasterize_ragged.py locks this against the cascade path).
    L = ctx.sorted_vals.shape[0]
    k_row = jnp.repeat(k0, CB) + (jnp.arange(C * CB, dtype=jnp.int32) % CB)
    src = jnp.clip(ctx.offsets[jnp.repeat(ct, CB)] + k_row, 0, L - 1)
    table = ctx.packed[ctx.sorted_vals[src]].reshape(C, CB, 16)

    tloc = (jnp.arange(G, dtype=jnp.int32) % n_tiles).astype(jnp.int32)

    backend = getattr(config, "backend", "auto")
    interpret = not (backend in ("auto", "tile", "pallas")
                     and jax.default_backend() == "tpu")
    vec = bool(getattr(config, "blend_vec", 0))
    blend = _make_ragged_blend(txn, ts, G, CB, interpret, vec)
    color_t, finalT_t, _, _ = blend(table, caps_eff, ct, k0, last, tloc)

    vis = caps_eff > 0
    color_t = jnp.where(vis[:, None, None, None], color_t, 0.0)
    finalT_t = jnp.where(vis[:, None, None], finalT_t, 1.0)
    overflow = jnp.sum(ctx.full_counts - caps_eff) + ctx.m_dropped

    pxr = ts * ts // _LANES
    untile = lambda x: _untile(x, txn, tyn, ts, height, width)
    img = jax.vmap(untile)(color_t.reshape(B, n_tiles, 3, pxr, _LANES))
    T_img = jax.vmap(untile)(finalT_t.reshape(B, n_tiles, 1, pxr, _LANES))[:, 0]
    return img + T_img[:, None] * bg[None, :, None, None], overflow
