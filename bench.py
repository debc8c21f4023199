#!/usr/bin/env python
"""Headline benchmark: PBS throughput per chip on production parameters.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the BASELINE.md target of 5,000 PBS/s/chip
(the reference publishes no numbers of its own — BASELINE.md; its per-method
wall-clock depends on the host CPU).

Usage: python bench.py [--batch 2048] [--iters 3] [--params prod]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import numpy as np

CACHE_DIR = os.path.expanduser("~/.cache/fhestring_tpu")


def get_keys(params, seed=0):
    """Generate (or load cached) client/server keys for `params`."""
    from fhestring_tpu.numpy_ref import core as ref

    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, f"keys_{params.name}_{seed}.npz")
    if os.path.exists(path):
        data = np.load(path)
        sk = ref.SecretKeys(params, data["lwe_sk"], data["glwe_sk"])
        srv = ref.ServerKeys(params, data["bsk"], data["ksk"])
        return sk, srv
    return _gen_keys(params, seed, path)


def _gen_keys(params, seed, path):
    from fhestring_tpu.numpy_ref import core as ref
    t0 = time.time()
    from fhestring_tpu import native

    if native.keygen_available():
        sk, srv = native.keygen_native(params, seed.to_bytes(16, "little"))
    else:
        rng = np.random.default_rng(seed)
        sk, srv = ref.keygen(params, rng)
    print(f"# keygen took {time.time() - t0:.1f}s", file=sys.stderr)
    np.savez(path, lwe_sk=sk.lwe_sk, glwe_sk=sk.glwe_sk, bsk=srv.bsk,
             ksk=srv.ksk)
    return sk, srv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--params", default="turbo",
                    choices=["turbo", "prod", "test", "noisy"],
                    help="turbo = 32-bit-torus production set (the default "
                         "headline path); prod = the 64-bit tfhe-rs mirror")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of one iteration")
    ap.add_argument("--ntt", action="store_true",
                    help="use the CRT-NTT external product path")
    ap.add_argument("--ntt2", action="store_true",
                    help="use the negacyclic CRT-NTT Pallas kernel path")
    ap.add_argument("--fused", action="store_true",
                    help="use the fused whole-blind-rotation kernel "
                         "(the default on TPU)")
    ap.add_argument("--matmul", action="store_true",
                    help="force the Hankel-matmul kernel path")
    ap.add_argument("--rounded", action="store_true",
                    help="fused kernel with ROUNDED gadget decomposition "
                         "(plaintext-equivalent; shears one int32 plane "
                         "instead of the u64 accumulator)")
    ap.add_argument("--approx", action="store_true",
                    help="fused kernel with plane-truncated external product "
                         "(plaintext-equivalent; drops shift planes < 256^3, "
                         "removing one inverse NTT of three)")
    args = ap.parse_args()

    import jax

    from fhestring_tpu.compat import enable_compile_cache

    enable_compile_cache()

    from fhestring_tpu import params as P
    from fhestring_tpu import torus
    from fhestring_tpu.crypto import keys as dkeys
    from fhestring_tpu.crypto import pbs as dpbs
    from fhestring_tpu.numpy_ref import core as ref

    params = {"turbo": P.PARAM_TURBO, "prod": P.PARAM_PROD,
              "test": P.PARAM_TEST_ZERO_NOISE,
              "noisy": P.PARAM_TEST_NOISY}[args.params]
    print(f"# params={params.name} devices={jax.devices()}", file=sys.stderr)

    sk, srv = get_keys(params)
    dev = dkeys.pack_server_keys(srv)
    turbo = params.torus_bits == 32
    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu and not (args.ntt or args.ntt2 or args.matmul):
        # Default TPU path = the production path (shortint._pbs_padded):
        # the fused whole-blind-rotation NTT kernel. 32-bit torus: EXACT
        # fused32 kernel. 64-bit torus: rounded decomposition + plane-
        # truncated external product (715 vs 597 exact-fused vs 428 matmul
        # PBS/s at B=1024 prod params; benchmarks/RESULTS.md).
        if not args.fused:
            args.fused = True
            if not turbo:
                args.rounded = True
                args.approx = True
    if args.ntt2 or args.fused:
        import jax.numpy as jnp
        suffix = "32" if turbo else "2"
        npath = os.path.join(CACHE_DIR, f"keysntt{suffix}_{params.name}_0.npy")
        if os.path.exists(npath):
            bsk_ntt = np.load(npath)
        else:
            t0 = time.time()
            if turbo:
                bsk_ntt = dkeys.pack_bsk_ntt32(srv.bsk)
            else:
                bsk_ntt = dkeys.pack_bsk_ntt2(np.asarray(dev.bsk_limbs))
            print(f"# NTT{suffix} key packing took {time.time() - t0:.1f}s",
                  file=sys.stderr)
            np.save(npath, bsk_ntt)
        dev = dkeys.DeviceServerKeys(
            dev.params, dev.bsk_limbs, dev.ksk_limbs, None,
            None if turbo else jnp.asarray(bsk_ntt),
            jnp.asarray(bsk_ntt) if turbo else None)
    if args.ntt:
        # cache the (expensive) NTT-domain key packing
        npath = os.path.join(CACHE_DIR, f"keysntt_{params.name}_0.npy")
        if os.path.exists(npath):
            bsk_ntt = np.load(npath)
        else:
            t0 = time.time()
            bsk_ntt = dkeys.pack_bsk_ntt(np.asarray(dev.bsk_limbs))
            print(f"# NTT key packing took {time.time() - t0:.1f}s",
                  file=sys.stderr)
            np.save(npath, bsk_ntt)
        import jax.numpy as jnp
        dev = dkeys.DeviceServerKeys(dev.params, dev.bsk_limbs,
                                     dev.ksk_limbs, jnp.asarray(bsk_ntt))
    bank = dkeys.pack_luts([[(3 * x + 1) % 16 for x in range(16)]], params)

    B = args.batch
    rng = np.random.default_rng(1)
    msgs = rng.integers(0, 16, size=B)
    cts = np.stack([ref.shortint_encrypt(sk, int(m), rng) for m in msgs])
    dct = torus.from_numpy(cts)
    idx = np.zeros(B, np.int32)

    import jax.numpy as jnp

    # jax.block_until_ready returns before the remote axon execution
    # finishes; fetching a RESULT-DEPENDENT value is the only reliable
    # fence. Fetching the full ciphertext array is NOT a neutral fence: the
    # 8-16 MB tunnel transfer alone measures ~0.7 s (measured round 3),
    # which had been inflating every recorded PBS/s number by ~30-40%. A
    # tiny jitted reduction (compiled once; 4-byte fetch) fences execution
    # without measuring tunnel bandwidth.
    _fence = jax.jit(lambda lo: lo.ravel()[::4099].astype(jnp.uint32).sum())

    def sync(x):
        np.asarray(_fence(x.lo))

    use_pallas = on_tpu and not (args.ntt or args.ntt2 or args.fused)

    def run():
        return dpbs.pbs_batch(dct, idx, bank, dev, use_pallas=use_pallas,
                              use_ntt=args.ntt, use_ntt2=args.ntt2,
                              use_fused=args.fused, rounded=args.rounded,
                              approx=args.approx)

    t0 = time.time()
    out = run()
    sync(out)
    print(f"# first call (incl. compile): {time.time() - t0:.1f}s", file=sys.stderr)

    times = []
    for _ in range(args.iters):
        t0 = time.time()
        out = run()
        sync(out)
        times.append(time.time() - t0)

    if args.profile:
        try:
            with jax.profiler.trace(args.profile):
                sync(run())
            print(f"# profiler trace written to {args.profile}", file=sys.stderr)
        except Exception as e:  # profiling is best-effort on remote backends
            print(f"# profiler unavailable: {e!r}", file=sys.stderr)
    best = min(times)
    pbs_per_sec = B / best
    print(f"# best of {args.iters}: {best * 1e3:.1f} ms for B={B} "
          f"-> {pbs_per_sec:.1f} PBS/s", file=sys.stderr)

    # correctness spot check
    table = [(3 * x + 1) % 16 for x in range(16)]
    host = torus.to_numpy(out)
    n_check = min(B, 16)
    ok = all(ref.shortint_decrypt(sk, host[i]) == table[msgs[i]]
             for i in range(n_check))
    if not ok:
        print(f"# WARNING: correctness check FAILED", file=sys.stderr)

    print(json.dumps({
        "metric": "pbs_throughput_per_chip",
        "value": round(pbs_per_sec, 1),
        "unit": "PBS/s",
        "vs_baseline": round(pbs_per_sec / 5000.0, 4),
    }))


if __name__ == "__main__":
    main()
