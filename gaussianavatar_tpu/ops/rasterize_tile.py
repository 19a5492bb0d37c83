"""Tile-binned differentiable Gaussian splatting — the TPU-native replacement
for the CUDA `diff-gaussian-rasterization` extension the reference depends on
(/root/reference/gaussian_renderer/__init__.py:6).

Pipeline (all static shapes, jit-compatible):
  1. depth sort (XLA stable sort over N gaussians),
  2. tile binning: each gaussian emits up to M=(MW*MH) (tile, rank) keys;
     one XLA sort of the N*M keys groups them by tile in depth order; a
     searchsorted pass yields per-tile offsets; a gather builds fixed-capacity
     per-tile parameter tables (T, K, 16) — this replaces the CUDA radix-sort
     + dynamic per-tile ranges with a fully static-shape equivalent,
  3. per-tile alpha blending:
       - Pallas TPU kernel (forward + analytic backward as a custom VJP;
         pixels live as (ts*ts/128, 128) VPU-native registers),
       - or a vmapped jnp blender (`backend="xla"`) with identical semantics
         for CPU tests and as an autodiff cross-check.

Blending semantics (incl. the 1/255 alpha floor, 0.99 clamp with CUDA's
straight-through backward quirk, 1e-4 early termination, and per-pixel
n_contrib bookkeeping) are locked against `rasterize_ref.blend_pixels`.

Capacity: a tile blends at most K (`tile_capacity`) gaussians — the closest K
in depth order win — and a gaussian covers at most MW*MH tiles
(`max_tiles_per_gaussian`). Truncation is never silent: every entry point
reports `overflow`, the number of gaussian-tile pairs dropped by the caps.

Two-tier capacity (`tile_capacity_hi` > 0): most tiles hold far fewer
gaussians than the busiest ones, so a single K sized for the worst tile
wastes gather bandwidth and kernel DMA on all the others. Instead the base
pass blends every tile at a small K, and a second pass blends ranks
[K, K+K_hi) for only the `heavy_fraction` most-loaded tiles; the segments
compose exactly (alpha blending is linear in incoming transmittance):
    color = c1 + T1 * c2,   T = T1 * T2
with the base pass's early-termination mask gating the continuation (a pixel
the CUDA rule stopped accepts nothing from segment 2). The one deviation from
the uncapped CUDA order of operations: segment 2's own 1e-4 termination test
runs on its LOCAL transmittance, so it fires later than a global test would —
strictly CLOSER to the uncapped reference (fewer dropped contributions).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussianavatar_tpu.ops.projection import ProjectedGaussians
from gaussianavatar_tpu.ops.rasterize_ref import (
    ALPHA_MAX,
    ALPHA_MIN,
    T_EPS,
    blend_pixels,
)
from gaussianavatar_tpu.ops.blend_vec import vec_fwd_chunk
# lean = pass-reduced restructuring of vec_bwd_chunk (same reduction set,
# fewer full-(CB, PX) elementwise passes; float-tolerance-identical).
# Measured v5e canonical shapes: 10.2 vs 10.9 ms standalone bwd
# (scripts/blend_bwd_bench.py, docs/blend_bwd_bench_r5.json).
from gaussianavatar_tpu.ops.blend_vec import vec_bwd_chunk_lean as vec_bwd_chunk

_LANES = 128
_CHUNK = 8  # gaussians per unrolled inner step in the Pallas kernels


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# --------------------------------------------------------------------------
# Binning (XLA)
# --------------------------------------------------------------------------

class BinContext(NamedTuple):
    """Sorted gaussian-tile key table for one batch of views; per-tile
    parameter slabs of any (start, capacity) window gather from it."""
    offsets: jax.Array      # (B*T+1,) int32: tile t owns sorted rows [offsets[t], offsets[t+1])
    sorted_vals: jax.Array  # (B*N*M,) int32 flat gaussian ids in (tile, depth) order
    packed: jax.Array       # (B*N, 16) per-gaussian params: mx,my|a,b,c|r,g,b|op|valid|pad
    full_counts: jax.Array  # (B*T,) int32 true (uncapped) gaussians per tile
    m_dropped: jax.Array    # () int32 gaussian-tile pairs cut by the MW*MH footprint cap


def _footprint_rects(mx, r, v, ts, txn, tyn, MW, MH):
    """Capped tile rects for every gaussian: (x0, y0, spanx, spany,
    m_dropped, raw_pairs). Tile rect follows CUDA getRect semantics
    ([min, max) clamped to the grid); footprints wider than MW x MH tiles
    are recentered on the mean's tile and clipped, with every clipped
    gaussian-tile pair counted in `m_dropped` (never silent).
    `raw_pairs` = sum of UNCAPPED rect areas over valid gaussians."""
    x0 = jnp.clip(jnp.floor((mx[..., 0] - r) / ts), 0, txn).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((mx[..., 0] + r + ts - 1) / ts), 0, txn).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((mx[..., 1] - r) / ts), 0, tyn).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((mx[..., 1] + r + ts - 1) / ts), 0, tyn).astype(jnp.int32)

    cxt = jnp.clip((mx[..., 0] // ts).astype(jnp.int32), x0, jnp.maximum(x1 - 1, x0))
    cyt = jnp.clip((mx[..., 1] // ts).astype(jnp.int32), y0, jnp.maximum(y1 - 1, y0))
    spanx = x1 - x0
    spany = y1 - y0
    raw_area = spanx * spany
    x0 = jnp.where(spanx > MW, jnp.clip(cxt - MW // 2, x0, x1 - MW), x0)
    y0 = jnp.where(spany > MH, jnp.clip(cyt - MH // 2, y0, y1 - MH), y0)
    spanx = jnp.minimum(spanx, MW)
    spany = jnp.minimum(spany, MH)
    m_dropped = jnp.sum(jnp.where(v, raw_area - spanx * spany, 0))
    raw_pairs = jnp.sum(jnp.where(v, raw_area, 0))
    return x0, y0, spanx, spany, m_dropped, raw_pairs


def footprint_drop(
    projs: ProjectedGaussians,
    opacities: jax.Array,
    height: int,
    width: int,
    ts: int,
    M: int,
) -> Tuple[jax.Array, jax.Array]:
    """(dropped_pairs, total_pairs) a footprint cap of M tiles/gaussian
    would cut on this batch — the decision input for the training loop's
    adaptive footprint (shrink M=9 -> 4 once the scene's gaussians are
    small enough that the cap clips ~nothing; warm-up-scale gaussians span
    many tiles and NEED the wide footprint for full gradients). Pure rect
    math on the projections — no binning/sort."""
    MW = MH = int(math.isqrt(M))
    B, N = projs.depths.shape
    txn, tyn = _cdiv(width, ts), _cdiv(height, ts)
    v = (projs.radii > 0) & (opacities.reshape(B, N) >= ALPHA_MIN)
    _, _, _, _, m_dropped, raw_pairs = _footprint_rects(
        projs.means2d, projs.radii, v, ts, txn, tyn, MW, MH)
    return m_dropped, raw_pairs


def _bin_gaussians(
    projs: ProjectedGaussians,   # batched (B, N, ...) fields
    colors: jax.Array,           # (B, N, 3)
    opacities: jax.Array,        # (B, N)
    height: int,
    width: int,
    ts: int,
    MW: int,
    MH: int,
    stable: bool = True,
) -> BinContext:
    """Bin a whole batch with ONE flat key sort.

    Key layout: ((b*T + tile) << DEPTH_BITS) | depth_quant. A vmapped sort
    lowers ~1.7x slower than one flat sort on TPU, so the batch is folded
    into the key's tile field instead. depth_bits adapts so B*T*2^depth_bits
    fits int31 (28 bits at small tile counts, >=19 for 4x1024^2 workloads).
    Depth precision also affects TRAINING, not just rendering: 21-bit keys
    let near-coincident surface gaussians tie and blend in index order,
    which degraded a (chaotic, single-seed) 300-step convergence probe 2x;
    28-bit keys restore exact-order behavior at zero cost."""
    B, N = projs.depths.shape
    txn, tyn = _cdiv(width, ts), _cdiv(height, ts)
    T = txn * tyn
    M = MW * MH

    depth_bits = 28
    while (B * T) << depth_bits >= 2**31 and depth_bits > 8:
        depth_bits -= 1
    if (B * T) << depth_bits >= 2**31:
        raise ValueError(f"too many tiles: batch({B}) * tiles({T}) overflows int32 keys")

    ops = opacities.reshape(B, N)
    # opacity < 1/255 can never pass the alpha floor — drop at binning time
    # (this is how padding gaussians with opacity 0 become free)
    v = (projs.radii > 0) & (ops >= ALPHA_MIN)
    mx = projs.means2d  # (B, N, 2)
    x0, y0, spanx, spany, m_dropped, _ = _footprint_rects(
        mx, projs.radii, v, ts, txn, tyn, MW, MH)

    depth_key = jax.lax.shift_right_logical(
        jax.lax.bitcast_convert_type(jnp.maximum(projs.depths, 1e-6), jnp.int32),
        32 - depth_bits,
    )  # top depth_bits of the positive float pattern (monotone)

    # Slot-major (M, B, N) layout: every intermediate keeps N (large) as the
    # minor dim, which tiles cleanly onto (8, 128) vregs. The naive (B, N, M)
    # layout puts M=9 in the lane dim and XLA pads it to 128 — ~14x wasted
    # bandwidth; measured ~6.6 ms of the ~7 ms binning cost at B=4 @512².
    # The sort consumes a flat array, so element order is free — but tie-break
    # order is not: the old layout + stable sort broke equal (tile, depth)
    # keys by gaussian index (CUDA radix-sort parity). A lexicographic 2-key
    # sort over (key, row) reproduces that exactly in any layout.
    slots = jnp.arange(M, dtype=jnp.int32)
    sx = (slots % MW)[:, None, None]   # (M, 1, 1)
    sy = (slots // MW)[:, None, None]
    tile_x = x0[None] + sx             # (M, B, N)
    tile_y = y0[None] + sy
    slot_valid = v[None] & (sx < spanx[None]) & (sy < spany[None])
    img_off = (jnp.arange(B, dtype=jnp.int32) * T)[None, :, None]
    tile_id = img_off + tile_y * txn + tile_x  # global tile in [0, B*T)

    keys = jnp.where(
        slot_valid,
        jax.lax.shift_left(tile_id, depth_bits) | depth_key[None],
        jnp.int32(2**31 - 1),
    )
    rows = jnp.broadcast_to(
        (jnp.arange(B, dtype=jnp.int32) * N)[None, :, None]
        + jnp.arange(N, dtype=jnp.int32)[None, None, :],
        (M, B, N),
    )  # flat index into (B*N)
    if stable:
        sorted_keys, sorted_vals = jax.lax.sort(
            (keys.reshape(-1), rows.reshape(-1)), num_keys=2
        )
    else:
        # single-key unstable sort: ~35% faster (no index tie-break chains
        # through the compare network); equal keys land in the deterministic
        # order the sort network produces, not gaussian-index order
        sorted_keys, sorted_vals = jax.lax.sort_key_val(
            keys.reshape(-1), rows.reshape(-1), is_stable=False
        )

    boundaries = jax.lax.shift_left(jnp.arange(B * T + 1, dtype=jnp.int32), depth_bits)
    offsets = jnp.searchsorted(sorted_keys, boundaries, side="left").astype(jnp.int32)
    full_counts = offsets[1:] - offsets[:-1]

    # single packed table: (B*N, 16) built once; every capacity window
    # gathers rows from it
    packed = jnp.concatenate(
        [
            mx.reshape(B * N, 2),
            projs.conics.reshape(B * N, 3),
            colors.reshape(B * N, 3),
            ops.reshape(B * N, 1),
            jnp.ones((B * N, 1), mx.dtype),  # valid channel (gated below)
            jnp.zeros((B * N, 6), mx.dtype),
        ],
        axis=-1,
    )  # 16 ch: mx,my | a,b,c | r,g,b | opacity | valid | 6 pad
    return BinContext(
        offsets=offsets, sorted_vals=sorted_vals, packed=packed,
        full_counts=full_counts, m_dropped=m_dropped,
    )


def _gather_tile_ids(
    ctx: BinContext, tile_sel: jax.Array, k0: int, K: int
) -> Tuple[jax.Array, jax.Array]:
    """Depth ranks [k0, k0+K) of the selected tiles -> gaussian ids (S, K)
    int32 (0 past a tile's true count) + counts (S,)."""
    off0 = ctx.offsets[tile_sel] + k0
    off1 = ctx.offsets[tile_sel + 1]
    idx = off0[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
    in_range = idx < off1[:, None]
    L = ctx.sorted_vals.shape[0]
    ids = jnp.where(in_range, ctx.sorted_vals[jnp.clip(idx, 0, L - 1)], 0)  # (S, K)
    counts = jnp.clip(off1 - off0, 0, K)
    return ids, counts


def _gather_tile_params(
    ctx: BinContext, tile_sel: jax.Array, k0: int, K: int, flat: bool = False
) -> Tuple[jax.Array, jax.Array]:
    """Gather depth ranks [k0, k0+K) of the selected tiles -> params
    (S, K, 16) + counts (S,). Rows past a tile's true count are zeroed
    (valid channel 0), so they are free in the blend.

    flat=False (default): plain row gather `packed[ids]` from the (B*N, 16)
    table. XLA lays that table out lane-tiled in HBM (minor dim 16 padded to
    128), so every 64-byte row read drags 512 bytes across the bus.
    flat=True gathers 16-element contiguous slices from the dense 1-D view
    instead (`lax.gather` slice_sizes=(16,)) — bit-identical values and VJP,
    1/8 the bytes — but was measured 17x SLOWER end to end (fwd+bwd raster
    pipeline 519 vs 30.6 ms, B=2 @512², v5e): TPU XLA lowers the 1-D sliced
    gather to a serial row-at-a-time path, while the padded row gather hits
    the vectorized fast path. Kept as the measured record + for future
    XLA generations (see BASELINE.md round-3 gather experiments)."""
    ids, counts = _gather_tile_ids(ctx, tile_sel, k0, K)
    S = ids.shape[0]
    in_range = jnp.arange(K, dtype=jnp.int32)[None, :] < counts[:, None]
    if flat:
        flat_tbl = ctx.packed.reshape(-1)  # (B*N*16,) dense
        params = jax.lax.gather(
            flat_tbl,
            (ids.reshape(-1, 1) * 16),
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,)
            ),
            slice_sizes=(16,),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        ).reshape(S, K, 16)
    else:
        params = ctx.packed[ids]
    params = params * in_range[..., None].astype(params.dtype)
    return params, counts


def _window_table(ctx: BinContext, pad_rows: int) -> jax.Array:
    """Permute the packed table into sorted (tile, depth) order ONCE and
    flatten it compact: every tile's depth ranks [k0, k0+K) then live in ONE
    contiguous 16*K-element window of the 1-D view. `pad_rows` zero rows
    (>= the SUM of tier capacities: a tail tile's window start off+k0 can
    overshoot the valid region by up to the cumulative prior capacity)
    keep every window read in-bounds without shifting it against its
    validity mask.

    Rationale (gather_window knob): the default row gather `packed[ids]`
    reads lane-padded rows — 512 B across the bus for a 64 B payload — and
    its row count is the CASCADE COST (sum over tiers of S*K), which the
    saturation-tuned 512-query cascade makes ~2.2x the key count L. The
    permutation costs ONE padded row gather of only L rows; the per-tile
    slabs then come from contiguous compact slices (64 B/row, sequential) —
    ~8x fewer gather bytes moving in access-pattern-friendly order. Whether
    XLA lowers the big-slice gather to per-slice block copies (fast) or the
    element-serial path that made 16-element slices 17x slower is a
    hardware question — this knob exists to measure exactly that."""
    permuted = ctx.packed[ctx.sorted_vals]  # (L, 16) row gather, fast path
    pad = jnp.zeros((pad_rows, permuted.shape[1]), permuted.dtype)
    return jnp.concatenate([permuted, pad]).reshape(-1)  # compact 1-D


def _window_tile_params(
    ctx: BinContext, window_tbl: jax.Array, tile_sel: jax.Array, k0: int, K: int
) -> Tuple[jax.Array, jax.Array]:
    """Window variant of `_gather_tile_params`: identical (S, K, 16) params
    + (S,) counts, built from `_window_table`'s flat view with one
    contiguous 16*K-element slice per selected tile."""
    off0 = ctx.offsets[tile_sel] + k0
    off1 = ctx.offsets[tile_sel + 1]
    counts = jnp.clip(off1 - off0, 0, K)
    S = tile_sel.shape[0]
    params = jax.lax.gather(
        window_tbl,
        (off0[:, None] * 16),
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,)
        ),
        slice_sizes=(16 * K,),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,  # zero-row padded
    ).reshape(S, K, 16)
    in_range = jnp.arange(K, dtype=jnp.int32)[None, :] < counts[:, None]
    # rows past the tile's count hold the NEXT tile's data — zero them, same
    # contract as the row gather (valid channel 0 -> free in the blend)
    params = params * in_range[..., None].astype(params.dtype)
    return params, counts


# --------------------------------------------------------------------------
# XLA blend backend (semantics twin of the Pallas kernel; CPU-friendly)
# --------------------------------------------------------------------------

def _blend_xla(params: jax.Array, tileids: jax.Array, txn: int, ts: int):
    """params (S, K, 16), tileids (S,) local tile index -> premultiplied
    color (S, PX, 3), final T (S, PX), n_contrib, done."""
    tx = (tileids % txn)[:, None]
    ty = (tileids // txn)[:, None]
    f = jnp.arange(ts * ts, dtype=jnp.int32)[None, :]
    px = (tx * ts + f % ts).astype(params.dtype)
    py = (ty * ts + f // ts).astype(params.dtype)

    def one(p, px1, py1):
        active = p[:, 9] > 0
        return blend_pixels(px1, py1, p[:, 0:2], p[:, 2:5], p[:, 5:8], p[:, 8], active)

    return jax.vmap(one)(params, px, py)


# --------------------------------------------------------------------------
# Pallas TPU kernels
# --------------------------------------------------------------------------

def _fwd_kernel(
    tileid_ref, count_ref, params_ref, color_ref, finalT_ref, ncon_ref, done_ref,
    *, K, ts, txn, acc=jnp.float32,
):
    pxr = ts * ts // _LANES
    t = pl.program_id(0)
    tile = tileid_ref[t]  # local tile index within the image grid
    tx = tile % txn
    ty = tile // txn
    f = (
        jax.lax.broadcasted_iota(jnp.int32, (pxr, _LANES), 0) * _LANES
        + jax.lax.broadcasted_iota(jnp.int32, (pxr, _LANES), 1)
    )
    # `acc` is the blend compute/accumulate dtype (the bf16 experiment knob).
    # Pixel coords stay f32: at bf16, x=511 has ulp 2px. dx is computed f32
    # against the f32 mean, THEN cast — dx is tile-local (|dx| < M*ts), so
    # the cast costs ~0.4% of dx instead of 2px of absolute position.
    px = (tx * ts + f % ts).astype(jnp.float32)
    py = (ty * ts + f // ts).astype(jnp.float32)

    count = count_ref[t]
    nchunks = pl.cdiv(count, _CHUNK)

    def body(st):
        ci, T, cr, cg, cb, done, ncon = st
        k0 = ci * _CHUNK
        p = params_ref[0, pl.ds(k0, _CHUNK), :]  # (_CHUNK, 16)
        for g in range(_CHUNK):
            k = k0 + g
            dx = (px - p[g, 0]).astype(acc)
            dy = (py - p[g, 1]).astype(acc)
            ca, cb_, cc = (p[g, 2].astype(acc), p[g, 3].astype(acc),
                           p[g, 4].astype(acc))
            power = -acc(0.5) * (ca * dx * dx + cc * dy * dy) - cb_ * dx * dy
            gval = jnp.exp(power)
            alpha = jnp.minimum(p[g, 8].astype(acc) * gval, acc(ALPHA_MAX))
            ok = (p[g, 9] > 0) & (k < count)
            # masks come from f32 casts: Mosaic can't mix i1 masks laid out
            # from 16-bit and 32-bit comparands in one blend (relayout error)
            pow32 = power.astype(jnp.float32)
            al32 = alpha.astype(jnp.float32)
            live = ok & (pow32 <= 0.0) & (al32 >= ALPHA_MIN)
            test_T = T * (acc(1.0) - alpha)
            trig = live & (test_T.astype(jnp.float32) < T_EPS)
            done = jnp.maximum(done, trig.astype(jnp.float32))  # f32 carry: Mosaic dislikes bool loop state
            m = live & (done == 0.0)
            w = jnp.where(m, alpha * T, acc(0.0))
            cr = cr + w * p[g, 5].astype(acc)
            cg = cg + w * p[g, 6].astype(acc)
            cb = cb + w * p[g, 7].astype(acc)
            T = jnp.where(m, test_T, T)
            ncon = jnp.where(m, k + 1, ncon)
        return (ci + 1, T, cr, cg, cb, done, ncon)

    def cond(st):
        ci, T, cr, cg, cb, done, ncon = st
        # early termination once EVERY pixel saturated (CUDA __syncthreads_count)
        return (ci < nchunks) & (jnp.min(done) < 1.0)

    zero = jnp.zeros((pxr, _LANES), acc)
    init = (
        jnp.int32(0),
        jnp.ones((pxr, _LANES), acc),
        zero, zero, zero,
        jnp.zeros((pxr, _LANES), jnp.float32),  # done mask carried as f32
        jnp.zeros((pxr, _LANES), jnp.int32),
    )
    _, T, cr, cg, cb, done, ncon = jax.lax.while_loop(cond, body, init)
    color_ref[0, 0] = cr.astype(jnp.float32)
    color_ref[0, 1] = cg.astype(jnp.float32)
    color_ref[0, 2] = cb.astype(jnp.float32)
    finalT_ref[0] = T.astype(jnp.float32)
    ncon_ref[0] = ncon
    done_ref[0] = done


def _bwd_kernel(
    tileid_ref, count_ref, params_ref, finalT_ref, ncon_ref, gimg_ref, gfT_ref, grads_ref,
    *, K, ts, txn,
):
    pxr = ts * ts // _LANES
    t = pl.program_id(0)
    tile = tileid_ref[t]
    tx = tile % txn
    ty = tile // txn
    f = (
        jax.lax.broadcasted_iota(jnp.int32, (pxr, _LANES), 0) * _LANES
        + jax.lax.broadcasted_iota(jnp.int32, (pxr, _LANES), 1)
    )
    px = (tx * ts + f % ts).astype(jnp.float32)
    py = (ty * ts + f // ts).astype(jnp.float32)

    count = count_ref[t]

    finalT = finalT_ref[0]
    ncon = ncon_ref[0]
    # gaussians beyond every pixel's last contributor have zero gradients:
    # traverse only cdiv(max ncon, CHUNK) chunks (their grad rows stay zeroed)
    nchunks = pl.cdiv(jnp.minimum(jnp.max(ncon), count), _CHUNK)
    gr = gimg_ref[0, 0]
    gg = gimg_ref[0, 1]
    gb = gimg_ref[0, 2]
    gfT = gfT_ref[0]

    grads_ref[0, :, :] = jnp.zeros((K, 16), jnp.float32)

    def body(i, st):
        T, ar, ag, ab = st
        ci = nchunks - 1 - i
        k0 = ci * _CHUNK
        p = params_ref[0, pl.ds(k0, _CHUNK), :]
        # per-gaussian integrands are collected and reduced ONCE per chunk:
        # a single (CHUNK*9, pxr, LANES) -> (CHUNK*9,) reduction is far
        # cheaper than 9 cross-lane reductions per gaussian
        integrands = [None] * _CHUNK
        for g in range(_CHUNK - 1, -1, -1):
            k = k0 + g
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
            Tn = jnp.where(m, T / one_m, T)  # transmittance BEFORE this gaussian
            wT = jnp.where(m, alpha * Tn, 0.0)
            dalpha = ((colr - ar) * gr + (colg - ag) * gg + (colb - ab) * gb) * Tn
            dalpha = dalpha + (-finalT / one_m) * gfT
            dalpha = jnp.where(m, dalpha, 0.0)
            # update suffix color accumulators AFTER using them
            ar = jnp.where(m, alpha * colr + one_m * ar, ar)
            ag = jnp.where(m, alpha * colg + one_m * ag, ag)
            ab = jnp.where(m, alpha * colb + one_m * ab, ab)
            # CUDA parity: dalpha/dG = opacity, ignoring the 0.99 clamp
            dpow = gval * op * dalpha
            # first-stage reduce: sublanes only (cheap), keep lanes
            srow = lambda x: jnp.sum(x, axis=0, keepdims=True)  # (1, LANES)
            integrands[g] = [
                srow(dpow * (ca * dx + cb_ * dy)),   # d_mx
                srow(dpow * (cb_ * dx + cc * dy)),   # d_my
                srow(-0.5 * dx * dx * dpow),         # d_ca
                srow(-dx * dy * dpow),               # d_cb
                srow(-0.5 * dy * dy * dpow),         # d_cc
                srow(wT * gr),                       # d_r
                srow(wT * gg),                       # d_g
                srow(wT * gb),                       # d_b
                srow(gval * dalpha),                 # d_op
            ]
            T = Tn

        # second stage: ONE lane reduction over the whole chunk's integrands
        flat = [arr for per_g in integrands for arr in per_g]
        stacked = jnp.concatenate(flat, axis=0)       # (CHUNK*9, LANES)
        sums = jnp.sum(stacked, axis=1)               # (CHUNK*9,)
        block = jnp.concatenate(
            [sums.reshape(_CHUNK, 9), jnp.zeros((_CHUNK, 7), jnp.float32)], axis=1
        )
        grads_ref[0, pl.ds(k0, _CHUNK), :] = block
        return (T, ar, ag, ab)

    zero = jnp.zeros((pxr, _LANES), jnp.float32)
    jax.lax.fori_loop(0, nchunks, body, (finalT, zero, zero, zero))


# --------------------------------------------------------------------------
# Row-vectorized kernels (ops/blend_vec): whole (VCB, ts*ts)-chunk arithmetic
# with the transmittance chain as a log2-step scan, sub-chunked over the K
# capacity (while_loop keeps the every-pixel-saturated early exit at VCB
# granularity; a static tail handles K % VCB — its rows are mask-gated so
# unconditional processing is exact). Same gating semantics as the sequential
# kernels, float-tolerance not bit-exact; selected by RasterParams.blend_vec.
# --------------------------------------------------------------------------

_VCB = 128  # rows per vectorized sub-chunk


def _fwd_kernel_vec(
    tileid_ref, count_ref, params_ref, color_ref, finalT_ref, ncon_ref, done_ref,
    *, K, ts, txn,
):
    PX = ts * ts
    t = pl.program_id(0)
    tile = tileid_ref[t]
    tx = tile % txn
    ty = tile // txn
    f = jax.lax.broadcasted_iota(jnp.int32, (1, PX), 1)
    px = (tx * ts + f % ts).astype(jnp.float32)
    py = (ty * ts + f // ts).astype(jnp.float32)
    count = count_ref[t]
    VCB = min(_VCB, K)
    nfull = K // VCB
    tail = K - nfull * VCB

    def body(st):
        ci, T, cr, cg, cb, done, ncon = st
        s0 = ci * VCB
        p = params_ref[0, pl.ds(s0, VCB), :]
        dcr, dcg, dcb, T, done, ncon = vec_fwd_chunk(
            p, px, py, s0, count, T, done, ncon)
        return (ci + 1, T, cr + dcr, cg + dcg, cb + dcb, done, ncon)

    def cond(st):
        nsub = jnp.minimum(pl.cdiv(count, VCB), nfull)
        return (st[0] < nsub) & (jnp.min(st[5]) < 1.0)

    zero = jnp.zeros((1, PX), jnp.float32)
    init = (
        jnp.int32(0), jnp.ones((1, PX), jnp.float32), zero, zero, zero,
        zero, jnp.zeros((1, PX), jnp.int32),
    )
    _, T, cr, cg, cb, done, ncon = jax.lax.while_loop(cond, body, init)
    if tail:
        p = params_ref[0, pl.ds(nfull * VCB, tail), :]
        dcr, dcg, dcb, T, done, ncon = vec_fwd_chunk(
            p, px, py, nfull * VCB, count, T, done, ncon)
        cr, cg, cb = cr + dcr, cg + dcg, cb + dcb
    color_ref[0, 0] = cr
    color_ref[0, 1] = cg
    color_ref[0, 2] = cb
    finalT_ref[0] = T
    ncon_ref[0] = ncon
    done_ref[0] = done


def _bwd_kernel_vec(
    tileid_ref, count_ref, params_ref, finalT_ref, ncon_ref, gimg_ref, gfT_ref, grads_ref,
    *, K, ts, txn,
):
    PX = ts * ts
    t = pl.program_id(0)
    tile = tileid_ref[t]
    tx = tile % txn
    ty = tile // txn
    f = jax.lax.broadcasted_iota(jnp.int32, (1, PX), 1)
    px = (tx * ts + f % ts).astype(jnp.float32)
    py = (ty * ts + f // ts).astype(jnp.float32)
    count = count_ref[t]
    finalT = finalT_ref[0]
    ncon = ncon_ref[0]
    gr = gimg_ref[0, 0]
    gg = gimg_ref[0, 1]
    gb = gimg_ref[0, 2]
    gfT = gfT_ref[0]

    grads_ref[0, :, :] = jnp.zeros((K, 16), jnp.float32)
    VCB = min(_VCB, K)
    nfull = K // VCB
    tail = K - nfull * VCB

    T0 = finalT
    E0 = jnp.zeros((1, PX), jnp.float32)
    if tail:
        # deepest rows first (reverse walk); rows past every pixel's last
        # contributor are mask-gated (m=0) so carries pass through unchanged
        p = params_ref[0, pl.ds(nfull * VCB, tail), :]
        block, T0, E0 = vec_bwd_chunk(
            p, px, py, nfull * VCB, count, ncon, finalT, gr, gg, gb, gfT, T0, E0)
        grads_ref[0, pl.ds(nfull * VCB, tail), :] = block
    # chunks beyond the deepest contributor carry zero grads: skip them
    nsub = jnp.minimum(pl.cdiv(jnp.minimum(jnp.max(ncon), count), VCB), nfull)

    def body(i, st):
        T, E = st
        ci = nsub - 1 - i
        s0 = ci * VCB
        p = params_ref[0, pl.ds(s0, VCB), :]
        block, T, E = vec_bwd_chunk(
            p, px, py, s0, count, ncon, finalT, gr, gg, gb, gfT, T, E)
        grads_ref[0, pl.ds(s0, VCB), :] = block
        return (T, E)

    jax.lax.fori_loop(0, nsub, body, (T0, E0))


def _pallas_fwd(params, counts, tileids, txn, ts, K, interpret, acc=jnp.float32,
                vec=False):
    G = params.shape[0]  # grid size = number of selected tiles
    if vec:
        pxr, lanes = 1, ts * ts
        kernel = functools.partial(_fwd_kernel_vec, K=K, ts=ts, txn=txn)
    else:
        pxr, lanes = ts * ts // _LANES, _LANES
        kernel = functools.partial(_fwd_kernel, K=K, ts=ts, txn=txn, acc=acc)
    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tile ids, tiny
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full counts vector, tiny
            pl.BlockSpec((1, K, 16), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, pxr, lanes), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pxr, lanes), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pxr, lanes), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pxr, lanes), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, 3, pxr, lanes), jnp.float32),
            jax.ShapeDtypeStruct((G, pxr, lanes), jnp.float32),
            jax.ShapeDtypeStruct((G, pxr, lanes), jnp.int32),
            jax.ShapeDtypeStruct((G, pxr, lanes), jnp.float32),
        ],
        interpret=interpret,
    )(tileids, counts, params)


def _pallas_bwd(params, counts, tileids, finalT, ncon, gimg, gfT, txn, ts, K,
                interpret, vec=False):
    G = params.shape[0]
    if vec:
        pxr, lanes = 1, ts * ts
        kernel = functools.partial(_bwd_kernel_vec, K=K, ts=ts, txn=txn)
    else:
        pxr, lanes = ts * ts // _LANES, _LANES
        kernel = functools.partial(_bwd_kernel, K=K, ts=ts, txn=txn)
    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tile ids
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full counts vector
            pl.BlockSpec((1, K, 16), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pxr, lanes), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pxr, lanes), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, pxr, lanes), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pxr, lanes), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K, 16), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, K, 16), jnp.float32),
        interpret=interpret,
    )(tileids, counts, params, finalT, ncon, gimg, gfT)


@functools.lru_cache(maxsize=32)
def _make_pallas_blend(txn: int, ts: int, K: int, interpret: bool,
                       acc_name: str = "float32", vec: bool = False):
    """custom-VJP blend over packed per-tile params; pixel axis lives as
    (ts*ts/128, 128) so every vector op is a full VPU register. The grid is
    one step per selected tile: a full batch of views, or any subset of
    tiles (the two-tier heavy pass), rides ONE launch.

    `acc_name` sets the FORWARD compute/accumulate dtype (bf16 experiment);
    the backward kernel always runs f32 — grads feed an f32 optimizer.
    `vec` selects the row-vectorized kernels (ops/blend_vec; f32 only —
    a non-f32 acc_name is rejected rather than silently ignored)."""
    if vec and acc_name != "float32":
        raise ValueError(
            "blend_vec=1 supports only float32 accumulation; set "
            "blend_acc_dtype='float32' or blend_vec=0 for the bf16-forward "
            "experiment (the sequential kernels implement it)")
    acc = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[acc_name]

    @jax.custom_vjp
    def blend(params, counts, tileids):
        return _pallas_fwd(params, counts, tileids, txn, ts, K, interpret, acc,
                           vec)

    def blend_fwd(params, counts, tileids):
        color, finalT, ncon, done = _pallas_fwd(
            params, counts, tileids, txn, ts, K, interpret, acc, vec)
        return (color, finalT, ncon, done), (params, counts, tileids, finalT, ncon)

    def blend_bwd(res, cot):
        params, counts, tileids, finalT, ncon = res
        gimg, gfT, _, _ = cot
        grads = _pallas_bwd(
            params, counts, tileids, finalT, ncon, gimg, gfT, txn, ts, K,
            interpret, vec
        )
        return grads, None, None

    blend.defvjp(blend_fwd, blend_bwd)
    return blend


# --------------------------------------------------------------------------
# Public entry
# --------------------------------------------------------------------------

def _untile(x: jax.Array, txn: int, tyn: int, ts: int, height: int, width: int) -> jax.Array:
    """(T, C, ts*ts/128, 128) tile-major -> (C, H, W)."""
    C = x.shape[1]
    x = x.reshape(tyn, txn, C, ts, ts)
    return x.transpose(2, 0, 3, 1, 4).reshape(C, tyn * ts, txn * ts)[:, :height, :width]


def rasterize_views_binned(
    projs: ProjectedGaussians,   # batched: every field has leading dim B
    colors: jax.Array,           # (B, N, 3)
    opacities: jax.Array,        # (B, N) or (B, N, 1)
    bg: jax.Array,               # (3,)
    height: int,
    width: int,
    config,
    caps=None,
) -> Tuple[jax.Array, jax.Array]:
    """Render a batch of views -> ((B, 3, H, W) image, () int32 overflow —
    the gaussian-tile pairs dropped by the capacity caps; 0 means the render
    is exact). Binning is vmapped XLA; the Pallas blend runs ONCE with the
    batch folded into its grid. With `config.tile_capacity_hi` > 0 a second
    blend pass extends the `heavy_fraction` busiest tiles to capacity
    K + K_hi (see module docstring). `caps` (per-tile capacities) requires
    the ragged backend."""
    if bool(getattr(config, "ragged", False)):
        from gaussianavatar_tpu.ops.rasterize_ragged import rasterize_views_ragged

        return rasterize_views_ragged(
            projs, colors, opacities.reshape(colors.shape[0], -1), bg,
            height, width, config, caps=caps,
        )
    if caps is not None:
        raise ValueError("per-tile caps require the ragged backend "
                         "(RasterizeConfig.ragged=1)")
    ts = config.tile_size
    M = config.max_tiles_per_gaussian
    # capacity tiers: explicit `tiers` wins; else (tile_capacity [+ _hi])
    tiers = list(getattr(config, "tiers", ()) or ())
    if not tiers:
        tiers = [(config.tile_capacity, 1.0)]
        K_hi = int(getattr(config, "tile_capacity_hi", 0))
        if K_hi > 0:
            tiers.append((K_hi, float(getattr(config, "heavy_fraction", 0.25))))
    K = tiers[0][0]
    MW = MH = int(math.isqrt(M))
    assert MW * MH == M, "max_tiles_per_gaussian must be a perfect square"
    assert (ts * ts) % _LANES == 0, "tile_size^2 must be a multiple of 128"
    for cap, frac in tiers:
        assert cap % _CHUNK == 0, "tier capacities must be multiples of 8"
        assert 0.0 < frac <= 1.0, "tier fractions must be in (0, 1]"
    assert tiers[0][1] == 1.0, "the base tier must cover every tile"
    assert all(tiers[i][1] >= tiers[i + 1][1] for i in range(len(tiers) - 1)), (
        "tier fractions must be non-increasing (each tier nests in the previous)"
    )

    B = colors.shape[0]
    txn, tyn = _cdiv(width, ts), _cdiv(height, ts)
    n_tiles = txn * tyn
    G = B * n_tiles

    ctx = _bin_gaussians(
        projs, colors, opacities, height, width, ts, MW, MH,
        stable=bool(getattr(config, "sort_stable", True)),
    )
    all_tiles = jnp.arange(G, dtype=jnp.int32)
    gather_flat = bool(getattr(config, "gather_flat", False))
    gather_window = bool(getattr(config, "gather_window", False))
    if gather_window:
        wtbl = _window_table(ctx, pad_rows=sum(cap for cap, _ in tiers))
        gat = lambda sel, k0, cap: _window_tile_params(ctx, wtbl, sel, k0, cap)
    else:
        gat = lambda sel, k0, cap: _gather_tile_params(
            ctx, sel, k0, cap, flat=gather_flat)
    params, counts = gat(all_tiles, 0, K)
    tileids = all_tiles % n_tiles

    backend = getattr(config, "backend", "auto")
    if backend in ("auto", "tile"):
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"

    pxr = ts * ts // _LANES
    if backend == "xla":
        def blend_any(p, c, tids):
            premult, final_T, ncon, done = _blend_xla(p, tids, txn, ts)
            S = p.shape[0]
            return (
                premult.transpose(0, 2, 1).reshape(S, 3, pxr, _LANES),
                final_T.reshape(S, pxr, _LANES),
                ncon.reshape(S, pxr, _LANES),
                done.astype(p.dtype).reshape(S, pxr, _LANES),
            )
    else:
        interpret = backend == "pallas_interpret"
        acc_name = str(getattr(config, "blend_acc_dtype", "float32"))
        vec = bool(getattr(config, "blend_vec", 0))

        def blend_any(p, c, tids):
            return _make_pallas_blend(
                txn, ts, p.shape[1], interpret, acc_name, vec)(p, c, tids)

    color_t, finalT_t, _, done_t = blend_any(params, counts, tileids)

    remaining = jnp.maximum(ctx.full_counts - K, 0)
    k0 = K
    for cap, frac in tiers[1:]:
        S = min(max(_CHUNK, int(round(G * frac))), G)
        # fractions are non-increasing, so each tier's top-S set nests inside
        # the previous tier's (top_k ties break by index, deterministically)
        hv = jax.lax.top_k(ctx.full_counts, S)[1].astype(jnp.int32)
        params_h, counts_h = gat(hv, k0, cap)
        c2, T2, _, d2 = blend_any(params_h, counts_h, hv % n_tiles)
        # compose segments: alpha blending is linear in incoming transmittance.
        # The early-termination gate is a non-differentiable cutoff (CUDA
        # treats it the same way), hence the stop_gradient.
        gate = 1.0 - jax.lax.stop_gradient(done_t[hv])   # (S, pxr, LANES)
        c1h = color_t[hv]
        T1h = finalT_t[hv]
        color_t = color_t.at[hv].set(c1h + (T1h * gate)[:, None] * c2)
        finalT_t = finalT_t.at[hv].set(jnp.where(gate > 0, T1h * T2, T1h))
        done_t = done_t.at[hv].set(jnp.maximum(done_t[hv], d2))
        remaining = remaining.at[hv].set(jnp.maximum(remaining[hv] - cap, 0))
        k0 += cap
    overflow = jnp.sum(remaining) + ctx.m_dropped

    untile = lambda x: _untile(x, txn, tyn, ts, height, width)
    img = jax.vmap(untile)(color_t.reshape(B, n_tiles, 3, pxr, _LANES))
    T_img = jax.vmap(untile)(finalT_t.reshape(B, n_tiles, 1, pxr, _LANES))[:, 0]
    return img + T_img[:, None] * bg[None, :, None, None], overflow


def probe_tile_depths(
    projs: ProjectedGaussians,
    colors: jax.Array,
    opacities: jax.Array,
    height: int,
    width: int,
    config,
    probe_capacity: int = 4096,
) -> Tuple[jax.Array, jax.Array]:
    """Saturation probe for the cascade auto-tuner: render one deep
    single-tier pass and return per-tile (true_count, NEEDED depth), both
    (B*T,) int32. Needed depth = max over the tile's pixels of n_contrib —
    the rank at which the blend's CUDA-parity early termination
    (T < 1e-4, reference forward.cu semantics) stopped consuming
    gaussians. Capacity >= needed depth makes forward AND backward exactly
    what the uncapped CUDA rasterizer computes (its backward also only
    traverses the contributing ranks), so tiers tuned on this histogram
    buy CUDA-exact coverage at a fraction of the raw-count capacity: on a
    converged avatar most binned pairs sit behind saturated transmittance.
    A tile whose needed depth equals `probe_capacity` may want more — the
    tuner treats it as "at least this much" (and overflow reporting stays
    honest either way).

    The probe runs whichever blend `config.blend_vec` selects, so a cached
    need table is consistent with the kernels that will consume it — but
    NOT interchangeable across blend_vec settings: the vectorized kernels'
    tree-reassociated transmittance products can flip a tile's needed depth
    by +-1 rank vs the sequential walk (test_vec_probe_matches_seq_
    needed_depths pins the bound). Regenerate need tables when toggling
    blend_vec; the train loop does this implicitly (tables are rebuilt at
    startup and every save-boundary retune, never persisted)."""
    ts = config.tile_size
    M = config.max_tiles_per_gaussian
    MW = MH = int(math.isqrt(M))
    B = colors.shape[0]
    txn, tyn = _cdiv(width, ts), _cdiv(height, ts)
    n_tiles = txn * tyn
    G = B * n_tiles
    K = max(_CHUNK, -(-probe_capacity // _CHUNK) * _CHUNK)

    ctx = _bin_gaussians(
        projs, colors, opacities, height, width, ts, MW, MH,
        stable=bool(getattr(config, "sort_stable", True)),
    )
    all_tiles = jnp.arange(G, dtype=jnp.int32)
    params, counts = _gather_tile_params(ctx, all_tiles, 0, K)
    tileids = all_tiles % n_tiles

    backend = getattr(config, "backend", "auto")
    if backend in ("auto", "tile"):
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "xla":
        _, _, ncon, _ = _blend_xla(params, tileids, txn, ts)  # (G, PX)
    else:
        blend = _make_pallas_blend(
            txn, ts, K, backend == "pallas_interpret",
            str(getattr(config, "blend_acc_dtype", "float32")),
            bool(getattr(config, "blend_vec", 0)),
        )
        _, _, ncon, _ = blend(params, counts, tileids)  # (G, pxr, LANES)
    needed = jnp.max(ncon.reshape(G, -1), axis=1).astype(jnp.int32)
    return ctx.full_counts, needed


def rasterize_tiled(
    proj: ProjectedGaussians,
    colors: jax.Array,
    opacities: jax.Array,
    bg: jax.Array,
    height: int,
    width: int,
    config,
) -> jax.Array:
    """Single-view entry: (3, H, W)."""
    projs = ProjectedGaussians(*(x[None] for x in proj))
    img, _ = rasterize_views_binned(
        projs, colors[None], opacities.reshape(1, -1), bg, height, width, config
    )
    return img[0]
