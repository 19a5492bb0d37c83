"""Microbench: the ragged chunk gather's constituent ops at canonical shape.

The round-3 ablation priced the ragged "gather" piece at ~31.5 ms of a
61.4 ms raster fwd+bwd (budget 684, CB=256, B=2 @512^2) but could not say
WHICH primitive pays: the scalar indirection (sorted_vals[src]), the padded
row gather (packed[ids]), or the backward's hidden scatter-add of the grad
rows into the packed table's cotangent. This script times each primitive
standalone at the same shapes, plus diagnostic variants that separate
issue-rate-bound from bandwidth-bound behavior:

  - row gather f32 vs bf16 (half the bytes, same row count),
  - row gather with sorted (memory-local) vs shuffled ids,
  - scalar scatter (int32 set) vs row scatter-add,
  - the fused production gather and its full fwd+bwd.

Every timed fn consumes its result through a weighted checksum (prevents
DCE) and cycles through 4 pre-generated index sets (prevents the axon
tunnel from serving cached dispatches). One block_until_ready after the
loop (see step_decomposition.py methodology notes).

    python scripts/gather_bench.py            # canonical: G=512, budget 684
    python scripts/gather_bench.py --rows 64  # sweep the stream size
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=410_000,
                    help="packed-table rows (B*N at the canonical workload)")
    ap.add_argument("--rows", type=int, default=350_208,
                    help="gathered rows (C*CB; canonical = G*budget = "
                         "512*684 chunk-rounded)")
    ap.add_argument("--m", type=int, default=9, help="slots per gaussian "
                    "(L = n*m for the scalar-scatter size)")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    N, R, L = args.n, args.rows, args.n * args.m
    rng = np.random.default_rng(0)
    variants = 4
    ids_np = [rng.integers(0, N, size=R).astype(np.int32) for _ in range(variants)]
    src_np = [rng.integers(0, L, size=R).astype(np.int32) for _ in range(variants)]
    perm_np = [rng.permutation(L).astype(np.int32) for _ in range(variants)]

    packed = jnp.asarray(rng.standard_normal((N, 16)).astype(np.float32))
    packed_bf16 = packed.astype(jnp.bfloat16)
    sorted_vals = jnp.asarray(rng.integers(0, N, size=L).astype(np.int32))
    grad_rows = jnp.asarray(rng.standard_normal((R, 16)).astype(np.float32))
    w_r = jnp.asarray(rng.standard_normal((16,)).astype(np.float32))
    ids = [jnp.asarray(a) for a in ids_np]
    ids_sorted = [jnp.asarray(np.sort(a)) for a in ids_np]
    src = [jnp.asarray(a) for a in src_np]
    perm = [jnp.asarray(a) for a in perm_np]
    iota_L = jnp.arange(L, dtype=jnp.int32)
    iota_R = jnp.arange(R, dtype=jnp.int32)

    def timed(name, fn, feeds):
        jfn = jax.jit(fn)
        out = jfn(feeds[0])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = jfn(feeds[i % variants])
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        rate = (R if name != "scalar_scatter_set" else L) / ms / 1e3
        print(f"{name:28s} {ms:8.2f} ms   ({rate:7.1f} rows/us)", flush=True)
        return ms

    # 1. scalar indirection: ids = sorted_vals[src]
    timed("scalar_gather", lambda s: jnp.sum(
        sorted_vals[s] * (iota_R % 7)), src)

    # 2. padded row gather (the production fast path)
    timed("row_gather_f32", lambda i: jnp.sum(packed[i] @ w_r), ids)
    timed("row_gather_bf16", lambda i: jnp.sum(
        (packed_bf16[i] @ w_r.astype(jnp.bfloat16)).astype(jnp.float32)), ids)
    timed("row_gather_f32_sortedids", lambda i: jnp.sum(packed[i] @ w_r),
          ids_sorted)

    # 3. fused production gather: scalar indirection feeding the row gather
    timed("fused_two_stage", lambda s: jnp.sum(
        packed[sorted_vals[s]] @ w_r), src)

    # 4. row scatter-add (the gather VJP's cost)
    timed("row_scatter_add", lambda i: jnp.sum(
        jnp.zeros((N, 16), jnp.float32).at[i].add(grad_rows) @ w_r), ids)
    timed("row_scatter_add_sortedids", lambda i: jnp.sum(
        jnp.zeros((N, 16), jnp.float32).at[i].add(grad_rows) @ w_r),
        ids_sorted)

    # 4b. row scatter-add with UNIQUE indices: the ragged grad reduction can
    #     construct collision-free indices (gaussian id x footprint slot is
    #     unique per stream row, padding rows get their own dump rows) — is
    #     the unique path materially faster than the colliding one?
    uniq_np = [rng.choice(N * 9 + R, size=R, replace=False).astype(np.int32)
               for _ in range(variants)]
    uniq = [jnp.asarray(a) for a in uniq_np]
    timed("row_scatter_add_unique", lambda i: jnp.sum(
        jnp.zeros((N * 9 + R, 16), jnp.float32).at[i].add(
            grad_rows, unique_indices=True) @ w_r), uniq)
    # the same including the (N,9,16)->(N,16) slot reduction the real
    # gradient needs afterwards
    timed("row_scatter_unique_reduce", lambda i: jnp.sum(
        jnp.sum(jnp.zeros((N * 9 + R, 16), jnp.float32).at[i].add(
            grad_rows, unique_indices=True)[: N * 9].reshape(N, 9, 16),
            axis=1) @ w_r), uniq)

    # 5. scalar scatter (set): the cost of materializing a sort's inverse
    #    permutation, if a gather-based grad reduction ever wanted one
    timed("scalar_scatter_set", lambda p: jnp.sum(
        jnp.zeros((L,), jnp.int32).at[p].set(iota_L) * (iota_L % 5)), perm)

    # 6. full fwd+bwd through the production gather w.r.t. packed
    def fwdbwd(s):
        def f(pk):
            return jnp.sum(pk[sorted_vals[s]] @ w_r)
        return jnp.sum(jax.grad(f)(packed) @ w_r)

    timed("fused_gather_fwd_bwd", fwdbwd, src)


if __name__ == "__main__":
    main()
