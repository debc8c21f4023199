#!/usr/bin/env python
"""Microbenchmark: the fused 32-bit-torus blind-rotation kernel ALONE.

Times one blind_rotate_fused32 pallas_call (all n steps) at turbo
production shapes with synthetic data, isolating the kernel from the PBS
glue (keyswitch, modswitch, initial rotation, sample extract) that bench.py
also measures.  Sweeps batch tile size and stage ablations.

Usage: python benchmarks/micro_fused32.py [--batch 1024] [--btiles 128 256]
       [--ablate fwd,pw,inv,crt]
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
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--btiles", type=int, nargs="*", default=[128])
    ap.add_argument("--approx", action="store_true")
    ap.add_argument("--halves", action="store_true",
                    help="half-tile interleaved variant (also cross-checks "
                         "bit-identity vs the stage-major kernel)")
    ap.add_argument("--ktwide", action="store_true",
                    help="pre-broadcast khat rows to [(k2,b8), n1] (8x "
                         "footprint, no in-kernel broadcast relayouts)")
    ap.add_argument("--ablate", default="",
                    help="comma-separated ablate strings to also sweep "
                         "(fwd, pw, inv, crt)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fhestring_tpu.compat import enable_compile_cache

    enable_compile_cache()

    from fhestring_tpu import params as P
    from fhestring_tpu.crypto.kernels.blind_rotate_fused32 import (
        blind_rotate_fused32, pack_fused32_consts)

    p = P.PARAM_TURBO
    N, kp1 = p.polynomial_size, p.glwe_dimension + 1
    R = kp1 * p.pbs_level
    n_steps = p.lwe_dimension
    B = args.batch
    rng = np.random.default_rng(0)

    acc_hi = jnp.asarray(rng.integers(0, 1 << 32, (B, kp1, N),
                                      dtype=np.uint64).astype(np.uint32))
    amounts = jnp.asarray(rng.integers(0, 2 * N, (B, n_steps))
                          .astype(np.int32))
    kh_rows = 128 if args.ktwide else N // 128
    khat = jnp.asarray(rng.integers(-20000, 20000,
                                    (n_steps, 2, R, kp1, 4, kh_rows, 128))
                       .astype(np.int16))
    consts = pack_fused32_consts(N)

    # result-dependent 4-byte fence (see bench.py sync: a full-array fetch
    # measures ~0.7 s of tunnel transfer, not kernel time)
    fence = jax.jit(lambda o: o.ravel()[::4099].astype(jnp.uint32).sum())

    def sync(out):
        np.asarray(fence(out))

    if args.halves:
        # bit-identity check vs the stage-major kernel on a small batch
        small = 128
        a = blind_rotate_fused32(
            acc_hi[:small], amounts[:small], khat, consts, n_poly=N,
            base_log=p.pbs_base_log, ell=p.pbs_level, b_tile=128,
            approx=args.approx, halves=False)
        b = blind_rotate_fused32(
            acc_hi[:small], amounts[:small], khat, consts, n_poly=N,
            base_log=p.pbs_base_log, ell=p.pbs_level, b_tile=128,
            approx=args.approx, halves=True)
        assert np.array_equal(np.asarray(a), np.asarray(b)), \
            "halves kernel diverges from stage-major kernel"
        print("# halves == stage-major: bit-identical", file=sys.stderr)

    ablations = [""] + [a for a in args.ablate.split(",") if a]
    for bt in args.btiles:
        for ab in ablations:
            def run():
                return blind_rotate_fused32(
                    acc_hi, amounts, khat, consts, n_poly=N,
                    base_log=p.pbs_base_log, ell=p.pbs_level, b_tile=bt,
                    approx=args.approx, halves=args.halves, ablate=ab)
            tag = f"turbo{('-' + ab) if ab else ''}{'-hv' if args.halves else ''}"
            t0 = time.time()
            sync(run())
            print(f"# {tag} bt={bt}: first call (incl. compile) "
                  f"{time.time() - t0:.1f}s", file=sys.stderr)
            best = 1e9
            for _ in range(args.reps):
                t0 = time.time()
                sync(run())
                best = min(best, time.time() - t0)
            print(f"{tag:16s} bt={bt:4d}  {best * 1e3:8.1f} ms "
                  f"(kernel-only) -> {B / best:7.1f} PBS-equiv/s "
                  f"({best / n_steps / B * 1e9:6.1f} ns/item/step)",
                  flush=True)


if __name__ == "__main__":
    main()
