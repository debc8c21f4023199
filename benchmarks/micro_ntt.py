"""Microbenchmark: per-kernel timing of the ntt2 blind-rotation step.

Runs each kernel inside a jitted lax.fori_loop (mirroring the real PBS
structure — one XLA program, no per-call remote dispatch overhead) and
reports per-step wall clock.  Ablations isolate kernel phases.

Usage: python benchmarks/micro_ntt.py [--batch 1024] [--steps 200]
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
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--reps", type=int, default=3)
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
    S = args.steps
    rng = np.random.default_rng(0)

    acc_lo = jnp.asarray(rng.integers(0, 1 << 32, (B, kp1, N), dtype=np.uint64)
                         .astype(np.uint32))
    acc_hi = jnp.asarray(rng.integers(0, 1 << 32, (B, kp1, N), dtype=np.uint64)
                         .astype(np.uint32))
    amt = jnp.asarray(rng.integers(0, 2 * N, B).astype(np.int32))
    dl0 = jnp.asarray(rng.integers(-128, 128, (La, B, R * N)).astype(np.int8))
    # Per-step NTT-domain keys, streamed from HBM by dynamic_slice inside the
    # loop exactly like pbs.step_ntt2 — reusing one key array would omit the
    # per-step key HBM traffic the real PBS pays. A pool of SK distinct steps
    # keeps host memory bounded while preserving the stream.
    SK = min(args.steps, 32)
    khat_pool = jnp.asarray(rng.integers(-30000, 30000,
                                         (SK, 3, R, kp1, 8, N // 128, 128))
                            .astype(np.int16))
    consts = pack_neg_consts(N, La)

    def timeit(name, fn, *args_):
        out = fn(*args_)
        jax.block_until_ready(out)
        _ = np.asarray(jax.tree.leaves(out)[0])
        best = 1e9
        for _ in range(args.reps):
            t0 = time.time()
            out = fn(*args_)
            jax.block_until_ready(out)
            _ = np.asarray(jax.tree.leaves(out)[0])
            best = min(best, time.time() - t0)
        per_step = best / S
        print(f"{name:28s} {per_step*1e3:8.3f} ms/step "
              f"({per_step/B*1e9:7.1f} ns/item/step)")
        return per_step

    @jax.jit
    def loop_prologue(lo, hi, a):
        def body(i, carry):
            lo, hi = carry
            dl = rotate_diff_decompose(lo, hi, a + i, n_poly=N,
                                       base_log=p.pbs_base_log, num_la=La,
                                       b_tile=128)
            # feed back so steps are sequential
            lo = lo + dl[0].reshape(B, kp1, N).astype(jnp.uint32)
            return lo, hi
        lo, hi = jax.lax.fori_loop(0, S, body, (lo, hi))
        return jnp.sum(lo, dtype=jnp.uint32)  # tiny host fetch

    timeit("prologue x%d" % S, loop_prologue, acc_lo, acc_hi, amt)

    def make_loop_ntt(ablate):
        @jax.jit
        def loop_ntt(dl):
            def body(i, dl):
                khat = jax.lax.dynamic_slice_in_dim(
                    khat_pool, i % SK, 1, axis=0)[0]
                lo, hi = ntt_ext_u64(dl, khat, consts, n_poly=N,
                                     ablate=ablate)
                d = lo.reshape(B, kp1 * N).astype(jnp.int8)
                return dl + d[None, :, : R * N]
            out = jax.lax.fori_loop(0, S, body, dl)
            return jnp.sum(out.astype(jnp.int32), dtype=jnp.int32)
        return loop_ntt

    timeit("ntt_ext x%d" % S, make_loop_ntt(""), dl0)
    for ab in [a for a in args.ablate.split(",") if a]:
        timeit(f"ntt_ext[{ab}] x%d" % S, make_loop_ntt(ab), dl0)


if __name__ == "__main__":
    main()
