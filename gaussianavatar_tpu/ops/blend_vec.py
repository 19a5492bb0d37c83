"""Row-vectorized alpha-blend chunk math for the Pallas rasterizer kernels.

The original kernels (ops/rasterize_tile._fwd_kernel, ops/rasterize_ragged.
_ragged_fwd_kernel and their backwards) walk the depth-ordered gaussian rows
of a tile ONE AT A TIME — an 8-unrolled loop where every row issues ~15-30
VPU ops on a single (ts*ts/128, 128) pixel register, strictly serialized by
the front-to-back transmittance recurrence T' = T*(1-alpha). On TPU that
leaves the VPU mostly idle: the only true sequential dependency is the
per-pixel cumulative PRODUCT of (1-alpha), everything else (alpha evaluation,
masking, weighting, color accumulation) is independent across rows.

This module computes a whole CB-row chunk at once on (CB, ts*ts) arrays:

  - alpha/masks/weights: elementwise over CB*ts*ts lanes (fully parallel),
  - the transmittance chain: an EXCLUSIVE cumulative product along the row
    axis via a log2(CB)-step Hillis-Steele scan (shift + multiply),
  - the CUDA early-termination rule (stop before the row that would push
    T below 1e-4, /root/reference's diff-gaussian-rasterization forward.cu
    semantics as locked by ops/rasterize_ref.blend_pixels): because the
    inclusive product T~_incl is monotonically NON-INCREASING along rows,
    "some earlier contributing row triggered termination" is exactly
    "T~_incl < T_EPS" — the mask needs no second scan,
  - color outputs: masked weighted reductions over the row axis.

The backward walks tiles back-to-front (chunk grid reversed) carrying two
per-pixel accumulators instead of the sequential kernel's four:

  - T_carry: transmittance after the chunk's rows (reconstructed per row as
    Tn_g = T_carry / P_g with P the inclusive SUFFIX product of the masked
    (1-alpha) factors — the same repeated-division reconstruction the CUDA
    backward uses, batched),
  - E_carry: the suffix sum of w_j * <color_j, dL/dcolor> — the sequential
    kernel's three "accum_rec" suffix colors ar/ag/ab collapse into this ONE
    scalar-per-pixel stream because they only ever enter dL/dalpha through
    the dot product with the incoming image gradient:
        dalpha_g = Tn_g*<c_g, g> - E_g/(1-alpha_g) - finalT*gfT/(1-alpha_g)
    (exactly the CUDA/sequential formula with ar = D/T_after substituted;
    see BASELINE.md round-4 "vectorized blend" entry for the derivation).

Numerics: identical masking/clamp rules (1/255 floor, 0.99 clamp with the
straight-through backward quirk, 1e-4 termination), but products/sums are
tree-reassociated by the scans, so results agree with the sequential kernels
to float tolerance (~1e-6 relative), not bit-exactly — the sequential kernels
remain the CUDA-parity semantics lock, and tests/test_blend_vec.py pins the
vec path against them and against finite differences.

Measured (v5e, 2688 chunks of (128 rows, 256 px), all rows contributing —
the need-table training regime): sequential 20.8 ms, vectorized 3.3 ms
(6.3x) with max|diff| 2e-7. The shifts use static-slice concatenation
(measured at parity with pltpu.roll, and interpreter-safe for CPU tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gaussianavatar_tpu.ops.rasterize_ref import ALPHA_MAX, ALPHA_MIN, T_EPS


def _shift_down(x: jax.Array, s: int, fill: float) -> jax.Array:
    """out[i] = x[i-s] along axis 0; the top s rows become `fill`."""
    rows = x.shape[0]
    pad = jnp.full((s,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([pad, x[: rows - s]], axis=0)


def _shift_up(x: jax.Array, s: int, fill: float) -> jax.Array:
    """out[i] = x[i+s] along axis 0; the bottom s rows become `fill`."""
    pad = jnp.full((s,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([x[s:], pad], axis=0)


def _exclusive_cumprod(fac: jax.Array) -> jax.Array:
    """prod_{j<i} fac[j] along axis 0 (Hillis-Steele, ceil(log2(rows)) steps)."""
    acc = _shift_down(fac, 1, 1.0)
    s = 1
    while s < fac.shape[0]:
        acc = acc * _shift_down(acc, s, 1.0)
        s *= 2
    return acc


def _inclusive_suffix_cumprod(fac: jax.Array) -> jax.Array:
    """prod_{j>=i} fac[j] along axis 0."""
    acc = fac
    s = 1
    while s < fac.shape[0]:
        acc = acc * _shift_up(acc, s, 1.0)
        s *= 2
    return acc


def _exclusive_suffix_cumsum(x: jax.Array) -> jax.Array:
    """sum_{j>i} x[j] along axis 0."""
    acc = _shift_up(x, 1, 0.0)
    s = 1
    while s < x.shape[0]:
        acc = acc + _shift_up(acc, s, 0.0)
        s *= 2
    return acc


def _alpha_eval(p, px, py, k0, count):
    """Shared per-chunk alpha evaluation. p (CB, 16) parameter rows,
    px/py (1, PX) pixel coordinates -> per-(row, pixel) arrays:
    (gval, alpha, live, k) with k the (CB, 1) absolute depth ranks and
    `live` the CUDA gating mask (valid & in-count & power<=0 & alpha floor)."""
    CB = p.shape[0]
    k = k0 + jax.lax.broadcasted_iota(jnp.int32, (CB, 1), 0)
    dx = px - p[:, 0:1]                      # (CB, PX)
    dy = py - p[:, 1:2]
    ca, cb_, cc = p[:, 2:3], p[:, 3:4], p[:, 4:5]
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb_ * dx * dy
    gval = jnp.exp(power)
    alpha = jnp.minimum(p[:, 8:9] * gval, ALPHA_MAX)
    ok = (p[:, 9:10] > 0) & (k < count)
    live = ok & (power <= 0.0) & (alpha >= ALPHA_MIN)
    return dx, dy, gval, alpha, live, k


def vec_fwd_chunk(p, px, py, k0, count, T_in, done_in, ncon_in):
    """Blend one (CB, 16) parameter chunk into per-pixel state.

    T_in/done_in (1, PX) f32, ncon_in (1, PX) int32. Returns
    (dcr, dcg, dcb, T_out, done_out, ncon_out) — color DELTAS (1, PX) to add
    to the running premultiplied color, plus updated carries."""
    PX = px.shape[-1]
    CB = p.shape[0]
    _, _, _, alpha, live, k = _alpha_eval(p, px, py, k0, count)
    fac = jnp.where(live, 1.0 - alpha, 1.0)
    Texc = T_in * _exclusive_cumprod(fac)    # T before each row (no termination)
    Tincl = Texc * fac                       # T after each row
    # termination: T~incl is non-increasing, so "a contributing row before or
    # at g pushed T below eps" == "Tincl_g < eps"; the triggering row itself
    # is NOT blended (CUDA continues before accumulating).
    m = live & (done_in == 0.0) & (Tincl >= T_EPS)
    w = jnp.where(m, alpha * Texc, 0.0)
    dcr = jnp.sum(w * p[:, 5:6], axis=0, keepdims=True)
    dcg = jnp.sum(w * p[:, 6:7], axis=0, keepdims=True)
    dcb = jnp.sum(w * p[:, 7:8], axis=0, keepdims=True)
    T_out = jnp.min(
        jnp.where(m, Tincl, jnp.broadcast_to(T_in, (CB, PX))), axis=0, keepdims=True
    )
    trig_min = jnp.min(jnp.where(live, Tincl, 1.0), axis=0, keepdims=True)
    done_out = jnp.maximum(done_in, (trig_min < T_EPS).astype(jnp.float32))
    ncon_out = jnp.maximum(
        ncon_in, jnp.max(jnp.where(m, k + 1, 0), axis=0, keepdims=True)
    )
    return dcr, dcg, dcb, T_out, done_out, ncon_out


def vec_bwd_chunk(p, px, py, k0, count, ncon, finalT, gr, gg, gb, gfT, T_carry, E_carry):
    """Backward for one chunk, walking back-to-front (caller iterates chunks
    in reverse). Returns ((CB, 16) per-row param grads, T_carry', E_carry').

    T_carry: transmittance AFTER this chunk's rows (finalT at a tile's last
    chunk). E_carry: suffix sum over later rows of w_j * <color_j, g>."""
    dx, dy, gval, alpha, live, k = _alpha_eval(p, px, py, k0, count)
    m = live & (k < ncon)                      # rows past termination: no grad
    fac = jnp.where(m, 1.0 - alpha, 1.0)
    P = _inclusive_suffix_cumprod(fac)
    Tn = T_carry / P                           # T BEFORE each row (CUDA-style
    #                                            repeated-division reconstruction)
    colg = p[:, 5:6] * gr + p[:, 6:7] * gg + p[:, 7:8] * gb
    wT = jnp.where(m, alpha * Tn, 0.0)
    e = wT * colg
    E = _exclusive_suffix_cumsum(e) + E_carry  # suffix <D_g, g> (ar = D/T_after)
    one_m = 1.0 - alpha
    dalpha = Tn * colg - E / one_m - (finalT / one_m) * gfT
    dalpha = jnp.where(m, dalpha, 0.0)
    # CUDA parity: dalpha/dG = opacity, ignoring the 0.99 clamp
    dpow = gval * p[:, 8:9] * dalpha
    ca, cb_, cc = p[:, 2:3], p[:, 3:4], p[:, 4:5]
    red = lambda x: jnp.sum(x, axis=1, keepdims=True)   # (CB, 1)
    CB = p.shape[0]
    block = jnp.concatenate(
        [
            red(dpow * (ca * dx + cb_ * dy)),   # d_mx
            red(dpow * (cb_ * dx + cc * dy)),   # d_my
            red(-0.5 * dx * dx * dpow),         # d_ca
            red(-dx * dy * dpow),               # d_cb
            red(-0.5 * dy * dy * dpow),         # d_cc
            red(wT * gr),                       # d_r
            red(wT * gg),                       # d_g
            red(wT * gb),                       # d_b
            red(gval * dalpha),                 # d_op
            jnp.zeros((CB, 7), jnp.float32),
        ],
        axis=1,
    )
    T_carry_new = T_carry / P[0:1]             # T before the chunk's first row
    E_carry_new = E_carry + jnp.sum(e, axis=0, keepdims=True)
    return block, T_carry_new, E_carry_new


def vec_bwd_chunk_lean(
    p, px, py, k0, count, ncon, finalT, gr, gg, gb, gfT, T_carry, E_carry
):
    """Pass-lean restructuring of `vec_bwd_chunk`: identical reduction
    COUNT (9 cross-lane sums — the irreducible output surface) but fewer
    full-(CB, PX) elementwise passes feeding them:

      - the mean/conic integrands share u = dpow*dx, v = dpow*dy
        (5 mults total instead of 11 mult/adds; the per-row conic
        combinations ca*Sdx + cb*Sdy move to (CB, 1) scalars),
      - d_op rides sum(dpow)/opacity instead of a gval*dalpha integrand
        (dpow = gval*op*dalpha row-scalar op; op == 0 rows have dpow == 0),
      - the three divisions collapse to two reciprocals (1/P shared by Tn
        and the T carry, 1/(1-alpha) shared by the E and finalT terms),
      - the E carry reuses the suffix-cumsum output instead of a fresh
        row reduction.

    Same reassociation class as `vec_bwd_chunk` (float-tolerance agreement,
    pinned by tests); measured on v5e canonical shapes by
    scripts/blend_bwd_bench.py.
    """
    dx, dy, gval, alpha, live, k = _alpha_eval(p, px, py, k0, count)
    m = live & (k < ncon)
    fac = jnp.where(m, 1.0 - alpha, 1.0)
    P = _inclusive_suffix_cumprod(fac)
    rcpP = 1.0 / P
    Tn = T_carry * rcpP
    colg = p[:, 5:6] * gr + p[:, 6:7] * gg + p[:, 7:8] * gb
    wT = jnp.where(m, alpha * Tn, 0.0)
    e = wT * colg
    E = _exclusive_suffix_cumsum(e) + E_carry
    rcp1m = 1.0 / (1.0 - alpha)
    dalpha = Tn * colg - (E + finalT * gfT) * rcp1m
    dalpha = jnp.where(m, dalpha, 0.0)
    dpow = gval * p[:, 8:9] * dalpha
    u = dpow * dx
    v = dpow * dy
    red = lambda x: jnp.sum(x, axis=1, keepdims=True)   # (CB, 1)
    M0, Sdx, Sdy = red(dpow), red(u), red(v)
    Sdxx, Sdxy, Sdyy = red(u * dx), red(u * dy), red(v * dy)
    ca, cb_, cc = p[:, 2:3], p[:, 3:4], p[:, 4:5]
    op = p[:, 8:9]
    rcp_op = jnp.where(op > 0, 1.0 / jnp.where(op > 0, op, 1.0), 0.0)
    CB = p.shape[0]
    block = jnp.concatenate(
        [
            ca * Sdx + cb_ * Sdy,              # d_mx
            cb_ * Sdx + cc * Sdy,              # d_my
            -0.5 * Sdxx,                       # d_ca
            -Sdxy,                             # d_cb
            -0.5 * Sdyy,                       # d_cc
            red(wT * gr),                      # d_r
            red(wT * gg),                      # d_g
            red(wT * gb),                      # d_b
            M0 * rcp_op,                       # d_op = sum(gval*dalpha)
            jnp.zeros((CB, 7), jnp.float32),
        ],
        axis=1,
    )
    T_carry_new = T_carry * rcpP[0:1]
    E_carry_new = E[0:1] + e[0:1]              # full suffix sum incl. row 0
    return block, T_carry_new, E_carry_new


def vec_bwd_chunk_mxu(
    p, px, py, k0, count, ncon, finalT, gr, gg, gb, gfT, T_carry, E_carry,
    precision=jax.lax.Precision.HIGHEST,
):
    """Moment-form variant of `vec_bwd_chunk`: same math, the 9 cross-lane
    (CB, PX) -> (CB, 1) reductions re-expressed as TWO matmuls against a
    shared (9, PX) basis so they run on the MXU instead of the VPU.

    The five geometric reductions are polynomial in the pixel offsets
    (dx = px - mx), so they expand over the pixel monomials
    [1, x, y, x^2, xy, y^2] with per-row coefficients:

        sum_px dpow * dx      = Mx  - mx*M0
        sum_px dpow * dx*dx   = Mxx - mx*(Mx + Sdx)          (etc.)

    with M* = dpow @ basis^T. The expansion is evaluated in TILE-LOCAL
    pixel coordinates (lx = px - px[0] in [0, ts)) so the monomials stay
    small (< ts^2) and the cancellation in Mxx - 2*mx*Mx + mx^2*M0 loses
    only ~log10(ts^2) digits instead of blowing up with the absolute pixel
    position. The three color reductions ride the same basis via its
    gr/gg/gb rows (second matmul against wT), and the opacity reduction
    sum(gval*dalpha) folds into M0 / opacity (dpow = gval*op*dalpha with a
    per-row scalar op; rows with op == 0 have dpow == 0 identically).

    The three divisions collapse to two reciprocals (1/P shared by Tn and
    the T carry; 1/(1-alpha) shared by the E and finalT terms).

    `precision` controls the matmul input precision: HIGHEST keeps f32
    operands (3-pass on the MXU), DEFAULT rounds them to bf16 (1-pass).
    Not bit-identical to `vec_bwd_chunk` (reassociated sums); agreement is
    pinned by tests/test_blend_vec.py and scripts/blend_bwd_bench.py.
    """
    dx, dy, gval, alpha, live, k = _alpha_eval(p, px, py, k0, count)
    del dx, dy
    m = live & (k < ncon)
    fac = jnp.where(m, 1.0 - alpha, 1.0)
    P = _inclusive_suffix_cumprod(fac)
    rcpP = 1.0 / P
    Tn = T_carry * rcpP
    colg = p[:, 5:6] * gr + p[:, 6:7] * gg + p[:, 7:8] * gb
    wT = jnp.where(m, alpha * Tn, 0.0)
    e = wT * colg
    E = _exclusive_suffix_cumsum(e) + E_carry
    rcp1m = 1.0 / (1.0 - alpha)
    dalpha = Tn * colg - (E + finalT * gfT) * rcp1m
    dalpha = jnp.where(m, dalpha, 0.0)
    dpow = gval * p[:, 8:9] * dalpha

    ox = px[:, 0:1]                            # tile origin (first pixel)
    oy = py[:, 0:1]
    lx = px - ox                               # (1, PX), values in [0, ts)
    ly = py - oy
    basis = jnp.concatenate(
        [jnp.ones_like(lx), lx, ly, lx * lx, lx * ly, ly * ly, gr, gg, gb],
        axis=0,
    )                                          # (9, PX)
    contract = (((1,), (1,)), ((), ()))
    Md = jax.lax.dot_general(dpow, basis, contract,
                             precision=precision,
                             preferred_element_type=jnp.float32)  # (CB, 9)
    Mw = jax.lax.dot_general(wT, basis, contract,
                             precision=precision,
                             preferred_element_type=jnp.float32)
    M0, Mx, My = Md[:, 0:1], Md[:, 1:2], Md[:, 2:3]
    Mxx, Mxy, Myy = Md[:, 3:4], Md[:, 4:5], Md[:, 5:6]
    mxl = p[:, 0:1] - ox                       # (CB, 1) local means
    myl = p[:, 1:2] - oy
    Sdx = Mx - mxl * M0
    Sdy = My - myl * M0
    Sdxx = Mxx - mxl * (Mx + Sdx)
    Sdxy = Mxy - myl * Mx - mxl * Sdy
    Sdyy = Myy - myl * (My + Sdy)
    ca, cb_, cc = p[:, 2:3], p[:, 3:4], p[:, 4:5]
    op = p[:, 8:9]
    rcp_op = jnp.where(op > 0, 1.0 / jnp.where(op > 0, op, 1.0), 0.0)
    CB = p.shape[0]
    block = jnp.concatenate(
        [
            ca * Sdx + cb_ * Sdy,              # d_mx
            cb_ * Sdx + cc * Sdy,              # d_my
            -0.5 * Sdxx,                       # d_ca
            -Sdxy,                             # d_cb
            -0.5 * Sdyy,                       # d_cc
            Mw[:, 6:7],                        # d_r
            Mw[:, 7:8],                        # d_g
            Mw[:, 8:9],                        # d_b
            M0 * rcp_op,                       # d_op = sum(gval*dalpha)
            jnp.zeros((CB, 7), jnp.float32),
        ],
        axis=1,
    )
    T_carry_new = T_carry * rcpP[0:1]
    E_carry_new = E[0:1] + e[0:1]              # full suffix sum incl. row 0
    return block, T_carry_new, E_carry_new
