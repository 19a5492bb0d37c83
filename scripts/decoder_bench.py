"""Microbench: ShapeDecoder (reference semantics) vs ShapeDecoderFused
(analytic-BN matmul-folded stages) at the canonical decoder shape
(B=1 deduped stage-1 decode, N~205k valid points, 66 input channels).

For each impl x dtype: fwd+bwd ms (grads to params), plus a numeric
agreement check of fused vs ref on identical params (same pytree).

    python scripts/decoder_bench.py [--n 204800] [--iters 30]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=204800)
    ap.add_argument("--cin", type=int, default=66)
    ap.add_argument("--hsize", type=int, default=128)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gaussianavatar_tpu.models.decoder import ShapeDecoder, ShapeDecoderFused

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, args.n, args.cin), jnp.float32) * 0.5

    ref = ShapeDecoder(hsize=args.hsize)
    variables = ref.init(jax.random.PRNGKey(1), x, True)
    params, bstats = variables["params"], variables["batch_stats"]

    def agreement():
        fused = ShapeDecoderFused(hsize=args.hsize)
        vref = ref.init(jax.random.PRNGKey(1), x, True)
        vfus = fused.init(jax.random.PRNGKey(1), x, True)
        same = jax.tree.all(jax.tree.map(
            lambda a, b: a.shape == b.shape and a.dtype == b.dtype, vref, vfus))
        print("param/stat pytree identical:", bool(same))
        (o_r, out_r) = ref.apply(vref, x, True, mutable=["batch_stats"])
        (o_f, out_f) = fused.apply(vref, x, True, mutable=["batch_stats"])
        for name, a, b in zip(("xyz", "scales", "shs"), o_r, o_f):
            d = float(jnp.max(jnp.abs(a - b)))
            print(f"  fwd {name:6s} max|diff| {d:.3e}")
        sd = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                          out_r["batch_stats"], out_f["batch_stats"])
        print("  batch_stats max|diff|:",
              max(jax.tree.leaves(sd)))

    agreement()

    xs = [jax.device_put(x + 0.01 * i) for i in range(4)]

    def bench(impl, dtype_name):
        cls = ShapeDecoderFused if impl == "fused" else ShapeDecoder
        mod = cls(hsize=args.hsize, compute_dtype=dtype_name)

        @jax.jit
        def fwd_bwd(p, xi):
            def f(pp):
                (xyz, scales, shs), _ = mod.apply(
                    {"params": pp, "batch_stats": bstats}, xi, True,
                    mutable=["batch_stats"])
                return jnp.sum(xyz) + jnp.sum(scales) + jnp.sum(shs)
            g = jax.grad(f)(p)
            return sum(jnp.sum(jnp.abs(t)) for t in jax.tree.leaves(g))

        out = fwd_bwd(params, xs[0])
        float(out)  # sync incl. compile
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = fwd_bwd(params, xs[i % 4])
        float(jnp.sum(out))
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{impl:6s} {dtype_name:9s} fwd+bwd {ms:8.2f} ms", flush=True)
        return ms

    for impl in ("ref", "fused"):
        for dt in ("float32", "bfloat16"):
            bench(impl, dt)


if __name__ == "__main__":
    main()
