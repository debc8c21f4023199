"""Microbenchmark: per-kernel timing of the ntt2 blind-rotation step.

Times rotate_diff_decompose and ntt_ext_u64 separately (and ablations of
the latter) at production shapes, to locate the bottleneck.

Usage: python benchmarks/micro_ntt.py [--batch 1024] [--reps 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--ablate", default="",
                    help="comma-separated ablate strings to also time")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fhestring_tpu.compat import enable_compile_cache

    enable_compile_cache()

    from fhestring_tpu import params as P
    from fhestring_tpu.crypto.kernels.ntt_ext import ntt_ext_u64, pack_neg_consts
    from fhestring_tpu.crypto.kernels.rotate_decompose import rotate_diff_decompose

    p = P.PARAM_PROD
    N, R, kp1, La = p.polynomial_size, 2, 2, 3
    B = args.batch
    rng = np.random.default_rng(0)

    acc_lo = jnp.asarray(rng.integers(0, 1 << 32, (B, kp1, N), dtype=np.uint64)
                         .astype(np.uint32))
    acc_hi = jnp.asarray(rng.integers(0, 1 << 32, (B, kp1, N), dtype=np.uint64)
                         .astype(np.uint32))
    amt = jnp.asarray(rng.integers(0, 2 * N, B).astype(np.int32))
    dl = jnp.asarray(rng.integers(-128, 128, (La, B, R * N)).astype(np.int8))
    khat = jnp.asarray(rng.integers(-30000, 30000,
                                    (3, R, kp1, 8, N // 128, 128))
                       .astype(np.int16))
    consts = pack_neg_consts(N, La)

    def timeit(name, fn):
        out = fn()
        jax.block_until_ready(out)
        _ = np.asarray(jax.tree.leaves(out)[0])  # host fetch fence
        t0 = time.time()
        for _ in range(args.reps):
            out = fn()
        jax.block_until_ready(out)
        _ = np.asarray(jax.tree.leaves(out)[0])
        dt = (time.time() - t0) / args.reps
        print(f"{name:28s} {dt*1e3:8.3f} ms  ({dt/B*1e6:.3f} us/item)")
        return dt

    timeit("rotate_diff_decompose", lambda: rotate_diff_decompose(
        acc_lo, acc_hi, amt, n_poly=N, base_log=p.pbs_base_log,
        num_la=La, b_tile=128))
    timeit("ntt_ext_u64", lambda: ntt_ext_u64(dl, khat, consts, n_poly=N))
    for ab in [a for a in args.ablate.split(",") if a]:
        timeit(f"ntt_ext_u64[{ab}]", lambda ab=ab: ntt_ext_u64(
            dl, khat, consts, n_poly=N, ablate=ab))


if __name__ == "__main__":
    main()
