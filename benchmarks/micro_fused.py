#!/usr/bin/env python
"""Microbenchmark: the fused whole-blind-rotation kernel ALONE.

Times one blind_rotate_fused pallas_call (all n steps) at production shapes
with synthetic data, isolating the kernel from the PBS glue (keyswitch,
modswitch, initial rotation, sample extract) that bench.py also measures.
Sweeps batch tile size and the rounded/approx modes.

Usage: python benchmarks/micro_fused.py [--batch 1024] [--btiles 128 256]
       [--modes exact rounded rounded+approx]
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
    ap.add_argument("--modes", nargs="*",
                    default=["rounded+approx"],
                    choices=["exact", "rounded", "approx", "rounded+approx"])
    ap.add_argument("--ablate", default="",
                    help="comma-separated ablate strings to also sweep "
                         "(shear, fwd, pw, inv, crt)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fhestring_tpu.compat import enable_compile_cache

    enable_compile_cache()

    from fhestring_tpu import params as P
    from fhestring_tpu.crypto.kernels.blind_rotate_fused import (
        blind_rotate_fused, pack_fused_consts)

    p = P.PARAM_PROD
    N, kp1, R = p.polynomial_size, p.glwe_dimension + 1, 2
    n_steps = p.lwe_dimension
    B = args.batch
    rng = np.random.default_rng(0)

    acc_lo = jnp.asarray(rng.integers(0, 1 << 32, (B, kp1, N),
                                      dtype=np.uint64).astype(np.uint32))
    acc_hi = jnp.asarray(rng.integers(0, 1 << 32, (B, kp1, N),
                                      dtype=np.uint64).astype(np.uint32))
    amounts = jnp.asarray(rng.integers(0, 2 * N, (B, n_steps))
                          .astype(np.int32))
    khat = jnp.asarray(rng.integers(-30000, 30000,
                                    (n_steps, 3, R, kp1, 8, N // 128, 128))
                       .astype(np.int16))
    num_la = (p.pbs_base_log + 8) // 8
    consts = pack_fused_consts(N, num_la)

    def sync(out):
        jax.block_until_ready(out)
        np.asarray(out[0])

    ablations = [""] + [a for a in args.ablate.split(",") if a]
    for mode in args.modes:
        rounded = "rounded" in mode
        approx = "approx" in mode
        for bt in args.btiles:
            for ab in ablations:
                def run():
                    return blind_rotate_fused(
                        acc_lo, acc_hi, amounts, khat, consts, n_poly=N,
                        base_log=p.pbs_base_log, b_tile=bt, rounded=rounded,
                        approx=approx, ablate=ab)
                tag = f"{mode}{('-' + ab) if ab else '':8s}"
                t0 = time.time()
                sync(run())
                print(f"# {tag} bt={bt}: first call (incl. compile) "
                      f"{time.time() - t0:.1f}s", file=sys.stderr)
                best = 1e9
                for _ in range(args.reps):
                    t0 = time.time()
                    sync(run())
                    best = min(best, time.time() - t0)
                print(f"{tag:24s} bt={bt:4d}  {best * 1e3:8.1f} ms "
                      f"(kernel-only) -> {B / best:7.1f} PBS-equiv/s "
                      f"({best / n_steps / B * 1e9:6.1f} ns/item/step)",
                      flush=True)


if __name__ == "__main__":
    main()
