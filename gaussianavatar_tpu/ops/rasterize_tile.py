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

Capacity notes: a tile blends at most K (`tile_capacity`) gaussians — the
closest K in depth order win; a gaussian covers at most MW*MH tiles
(`max_tiles_per_gaussian`), centered on its projected mean. Both caps are
config knobs; the CUDA original is uncapped but avatar workloads sit far
below these defaults.
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

_LANES = 128
_CHUNK = 8  # gaussians per unrolled inner step in the Pallas kernels


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# --------------------------------------------------------------------------
# Binning (XLA)
# --------------------------------------------------------------------------

class BinnedTiles(NamedTuple):
    params: jax.Array   # (T, K, 16) packed per-tile gaussian params
    counts: jax.Array   # (T,) int32 gaussians per tile (<= K)
    overflow: jax.Array  # () int32: total gaussian-tile pairs dropped by K cap


def _pack_tile_params_batched(
    projs: ProjectedGaussians,   # batched (B, N, ...) fields
    colors: jax.Array,           # (B, N, 3)
    opacities: jax.Array,        # (B, N)
    height: int,
    width: int,
    ts: int,
    K: int,
    MW: int,
    MH: int,
) -> BinnedTiles:
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
    r = projs.radii

    # tile rect, CUDA getRect semantics: [min, max) clamped to the grid
    x0 = jnp.clip(jnp.floor((mx[..., 0] - r) / ts), 0, txn).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((mx[..., 0] + r + ts - 1) / ts), 0, txn).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((mx[..., 1] - r) / ts), 0, tyn).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((mx[..., 1] + r + ts - 1) / ts), 0, tyn).astype(jnp.int32)

    # cap the footprint to MW x MH tiles, recentered on the mean's tile
    cxt = jnp.clip((mx[..., 0] // ts).astype(jnp.int32), x0, jnp.maximum(x1 - 1, x0))
    cyt = jnp.clip((mx[..., 1] // ts).astype(jnp.int32), y0, jnp.maximum(y1 - 1, y0))
    spanx = x1 - x0
    spany = y1 - y0
    x0 = jnp.where(spanx > MW, jnp.clip(cxt - MW // 2, x0, x1 - MW), x0)
    y0 = jnp.where(spany > MH, jnp.clip(cyt - MH // 2, y0, y1 - MH), y0)
    spanx = jnp.minimum(spanx, MW)
    spany = jnp.minimum(spany, MH)

    depth_key = jax.lax.shift_right_logical(
        jax.lax.bitcast_convert_type(jnp.maximum(projs.depths, 1e-6), jnp.int32),
        32 - depth_bits,
    )  # top depth_bits of the positive float pattern (monotone)

    slots = jnp.arange(M, dtype=jnp.int32)
    sx = slots % MW
    sy = slots // MW
    tile_x = x0[..., None] + sx  # (B, N, M)
    tile_y = y0[..., None] + sy
    slot_valid = v[..., None] & (sx < spanx[..., None]) & (sy < spany[..., None])
    img_off = (jnp.arange(B, dtype=jnp.int32) * T)[:, None, None]
    tile_id = img_off + tile_y * txn + tile_x  # global tile in [0, B*T)

    keys = jnp.where(
        slot_valid,
        jax.lax.shift_left(tile_id, depth_bits) | depth_key[..., None],
        jnp.int32(2**31 - 1),
    )
    rows = jnp.broadcast_to(
        (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
        + jnp.arange(N, dtype=jnp.int32)[None, :, None],
        (B, N, M),
    )  # flat index into (B*N)
    sorted_keys, sorted_vals = jax.lax.sort_key_val(keys.reshape(-1), rows.reshape(-1))

    boundaries = jax.lax.shift_left(jnp.arange(B * T + 1, dtype=jnp.int32), depth_bits)
    offsets = jnp.searchsorted(sorted_keys, boundaries, side="left").astype(jnp.int32)
    full_counts = offsets[1:] - offsets[:-1]
    counts = jnp.minimum(full_counts, K)  # (B*T,)
    overflow = jnp.sum(full_counts - counts)

    L = B * N * M
    idx = offsets[:-1, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
    in_range = idx < offsets[1:, None]
    ids = jnp.where(in_range, sorted_vals[jnp.clip(idx, 0, L - 1)], 0)  # (B*T, K)

    # single packed gather: (B*N, 16) built once, one (B*T, K) lookup
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
    params = packed[ids] * in_range[..., None].astype(mx.dtype)  # (B*T, K, 16)
    return BinnedTiles(params=params, counts=counts, overflow=overflow)


def _pack_tile_params(
    proj: ProjectedGaussians,
    colors: jax.Array,
    opacities: jax.Array,
    height: int,
    width: int,
    ts: int,
    K: int,
    MW: int,
    MH: int,
) -> BinnedTiles:
    """Single-image binning (tests / external callers)."""
    projs = ProjectedGaussians(*(x[None] for x in proj))
    return _pack_tile_params_batched(
        projs, colors[None], opacities.reshape(1, -1), height, width, ts, K, MW, MH
    )


# --------------------------------------------------------------------------
# XLA blend backend (semantics twin of the Pallas kernel; CPU-friendly)
# --------------------------------------------------------------------------

def _tile_pixel_coords(txn: int, tyn: int, ts: int, dtype) -> Tuple[jax.Array, jax.Array]:
    t = jnp.arange(txn * tyn, dtype=jnp.int32)
    tx = (t % txn)[:, None]
    ty = (t // txn)[:, None]
    f = jnp.arange(ts * ts, dtype=jnp.int32)[None, :]
    px = (tx * ts + f % ts).astype(dtype)
    py = (ty * ts + f // ts).astype(dtype)
    return px, py  # (T, ts*ts)


def _blend_xla(params: jax.Array, counts: jax.Array, txn: int, tyn: int, ts: int, n_images: int = 1):
    px, py = _tile_pixel_coords(txn, tyn, ts, params.dtype)
    if n_images > 1:
        px = jnp.tile(px, (n_images, 1))
        py = jnp.tile(py, (n_images, 1))

    def one(p, px1, py1):
        active = p[:, 9] > 0
        return blend_pixels(px1, py1, p[:, 0:2], p[:, 2:5], p[:, 5:8], p[:, 8], active)

    premult, final_T, ncon = jax.vmap(one)(params, px, py)
    return premult, final_T, ncon  # (T,PX,3), (T,PX), (T,PX)


# --------------------------------------------------------------------------
# Pallas TPU kernels
# --------------------------------------------------------------------------

def _fwd_kernel(count_ref, params_ref, color_ref, finalT_ref, ncon_ref, *, K, ts, txn, n_tiles):
    pxr = ts * ts // _LANES
    t = pl.program_id(0)
    tile = t % n_tiles  # batch of views is folded into the grid
    tx = tile % txn
    ty = tile // txn
    f = (
        jax.lax.broadcasted_iota(jnp.int32, (pxr, _LANES), 0) * _LANES
        + jax.lax.broadcasted_iota(jnp.int32, (pxr, _LANES), 1)
    )
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
            done = jnp.maximum(done, trig.astype(jnp.float32))  # f32 carry: Mosaic dislikes bool loop state
            m = live & (done == 0.0)
            w = jnp.where(m, alpha * T, 0.0)
            cr = cr + w * p[g, 5]
            cg = cg + w * p[g, 6]
            cb = cb + w * p[g, 7]
            T = jnp.where(m, test_T, T)
            ncon = jnp.where(m, k + 1, ncon)
        return (ci + 1, T, cr, cg, cb, done, ncon)

    def cond(st):
        ci, T, cr, cg, cb, done, ncon = st
        # early termination once EVERY pixel saturated (CUDA __syncthreads_count)
        return (ci < nchunks) & (jnp.min(done) < 1.0)

    zero = jnp.zeros((pxr, _LANES), jnp.float32)
    init = (
        jnp.int32(0),
        jnp.ones((pxr, _LANES), jnp.float32),
        zero, zero, zero,
        zero,  # done mask carried as f32
        jnp.zeros((pxr, _LANES), jnp.int32),
    )
    _, T, cr, cg, cb, done, ncon = jax.lax.while_loop(cond, body, init)
    color_ref[0, 0] = cr
    color_ref[0, 1] = cg
    color_ref[0, 2] = cb
    finalT_ref[0] = T
    ncon_ref[0] = ncon


def _bwd_kernel(
    count_ref, params_ref, finalT_ref, ncon_ref, gimg_ref, gfT_ref, grads_ref,
    *, K, ts, txn, n_tiles,
):
    pxr = ts * ts // _LANES
    t = pl.program_id(0)
    tile = t % n_tiles  # batch of views is folded into the grid
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


def _pallas_fwd(params, counts, txn, tyn, ts, K, interpret, n_images=1):
    n_tiles = txn * tyn
    T = n_images * n_tiles
    pxr = ts * ts // _LANES
    kernel = functools.partial(_fwd_kernel, K=K, ts=ts, txn=txn, n_tiles=n_tiles)
    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full counts vector, tiny
            pl.BlockSpec((1, K, 16), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, pxr, _LANES), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pxr, _LANES), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pxr, _LANES), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, 3, pxr, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((T, pxr, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((T, pxr, _LANES), jnp.int32),
        ],
        interpret=interpret,
    )(counts, params)


def _pallas_bwd(params, counts, finalT, ncon, gimg, gfT, txn, tyn, ts, K, interpret, n_images=1):
    n_tiles = txn * tyn
    T = n_images * n_tiles
    pxr = ts * ts // _LANES
    kernel = functools.partial(_bwd_kernel, K=K, ts=ts, txn=txn, n_tiles=n_tiles)
    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full counts vector, tiny
            pl.BlockSpec((1, K, 16), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pxr, _LANES), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pxr, _LANES), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, pxr, _LANES), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pxr, _LANES), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K, 16), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, K, 16), jnp.float32),
        interpret=interpret,
    )(counts, params, finalT, ncon, gimg, gfT)


@functools.lru_cache(maxsize=32)
def _make_pallas_blend(txn: int, tyn: int, ts: int, K: int, interpret: bool, n_images: int = 1):
    """custom-VJP blend over packed per-tile params; pixel axis lives as
    (ts*ts/128, 128) so every vector op is a full VPU register. A batch of
    views is folded into the kernel grid (one launch for the whole batch)."""

    @jax.custom_vjp
    def blend(params, counts):
        color, finalT, ncon = _pallas_fwd(params, counts, txn, tyn, ts, K, interpret, n_images)
        return color, finalT, ncon

    def blend_fwd(params, counts):
        color, finalT, ncon = _pallas_fwd(params, counts, txn, tyn, ts, K, interpret, n_images)
        return (color, finalT, ncon), (params, counts, finalT, ncon)

    def blend_bwd(res, cot):
        params, counts, finalT, ncon = res
        gimg, gfT, _ = cot
        grads = _pallas_bwd(
            params, counts, finalT, ncon, gimg, gfT, txn, tyn, ts, K, interpret, n_images
        )
        return grads, None

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
) -> jax.Array:
    """Render a batch of views -> (B, 3, H, W). Binning is vmapped XLA; the
    Pallas blend runs ONCE with the batch folded into its grid."""
    ts = config.tile_size
    K = config.tile_capacity
    M = config.max_tiles_per_gaussian
    MW = MH = int(math.isqrt(M))
    assert MW * MH == M, "max_tiles_per_gaussian must be a perfect square"
    assert (ts * ts) % _LANES == 0, "tile_size^2 must be a multiple of 128"
    assert K % _CHUNK == 0, "tile_capacity must be a multiple of 8"

    B = colors.shape[0]
    txn, tyn = _cdiv(width, ts), _cdiv(height, ts)
    n_tiles = txn * tyn

    binned = _pack_tile_params_batched(
        projs, colors, opacities, height, width, ts, K, MW, MH
    )
    params = binned.params  # already (B*T, K, 16)
    counts = binned.counts

    backend = getattr(config, "backend", "auto")
    if backend in ("auto", "tile"):
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"

    pxr = ts * ts // _LANES
    if backend == "xla":
        premult, final_T, _ = _blend_xla(params, counts, txn, tyn, ts, n_images=B)
        color_t = premult.transpose(0, 2, 1).reshape(-1, 3, pxr, _LANES)
        finalT_t = final_T.reshape(-1, pxr, _LANES)
    else:
        interpret = backend == "pallas_interpret"
        blend = _make_pallas_blend(txn, tyn, ts, K, interpret, B)
        color_t, finalT_t, _ = blend(params, counts)

    untile = lambda x: _untile(x, txn, tyn, ts, height, width)
    img = jax.vmap(untile)(color_t.reshape(B, n_tiles, 3, pxr, _LANES))
    T_img = jax.vmap(untile)(finalT_t.reshape(B, n_tiles, 1, pxr, _LANES))[:, 0]
    return img + T_img[:, None] * bg[None, :, None, None]


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
    img = rasterize_views_binned(
        projs, colors[None], opacities.reshape(1, -1), bg, height, width, config
    )
    return img[0]
