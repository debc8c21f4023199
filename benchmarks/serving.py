#!/usr/bin/env python
"""Multi-query serving benchmark: N concurrent encrypted queries per step.

The headline bench (bench.py) measures raw batched-PBS throughput at
B = 1024, but a SINGLE query's per-op PBS batches are small (8-194 wide,
benchmarks/methods_prod.json) so a one-query-at-a-time server idles the
chip. The TPU-native serving answer is query batching: Q concurrent
queries' PBS work flattens into one wide batch (query x window x pattern x
block), so per-op batch width scales with Q and the chip approaches its
raw kernel throughput.

This benchmark runs a batched homomorphic `contains` ("hello world" x
"ello", the reference driver's flagship op, reference
src/server_key/mod.rs:151-182) over Q in {1, 8, 32} concurrent queries and
reports queries/s, achieved PBS/s, and the fraction of bench.py's raw
kernel throughput reached.

Usage: python benchmarks/serving.py [--params turbo] [--queries 1 8 32]
Prints one JSON line per Q.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import numpy as np


def batched_contains(backend, s_blocks, pat_blocks, L: int, m: int):
    """contains over a query axis: s [Q, L] chars, pat [Q, m] chars -> [Q]
    bits. Same algorithm as engine.strings.contains (windowed eq ->
    AND-tree -> OR-tree) with every PBS batch Q x wider."""
    b = backend
    W = L - m + 1
    idx = np.arange(W)[:, None] + np.arange(m)[None, :]
    wins = b.take(s_blocks, idx, axis=1)            # [Q, W, m]
    pat_b = b.reshape(pat_blocks, (-1, 1, m))       # [Q, 1, m]
    eqs = b.eq(wins, pat_b)                         # [Q, W, m]
    match = b.all_axis(eqs, 2)                      # [Q, W]
    return b.any_axis(match, 1)                     # [Q]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default="turbo",
                    choices=["turbo", "prod", "test", "test32"])
    ap.add_argument("--queries", type=int, nargs="*", default=[1, 8, 32])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--string", default="hello world")
    ap.add_argument("--pattern", default="ello")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fhestring_tpu.compat import enable_compile_cache

    enable_compile_cache()

    from fhestring_tpu import metrics
    from fhestring_tpu import params as P
    from fhestring_tpu.client import ClientKey
    from fhestring_tpu.shortint import Blocks
    from fhestring_tpu.torus import U64

    params = {"turbo": P.PARAM_TURBO, "prod": P.PARAM_PROD,
              "test": P.PARAM_TEST_ZERO_NOISE,
              "test32": P.PARAM_TEST32_ZERO_NOISE}[args.params]
    print(f"# params={params.name} devices={jax.devices()}", file=sys.stderr)

    if args.params in ("turbo", "prod"):
        import bench

        ck = ClientKey(params, seed=0)
        sk, srv_raw = bench.get_keys(params)
        ck.secret, ck._server_raw = sk, srv_raw  # reuse the bench key cache
        cache = os.path.join(bench.CACHE_DIR, f"packed_{params.name}.npz")
        server = ck.get_server_key(cache_path=cache)
    else:
        ck = ClientKey(params, seed=0)
        server = ck.get_server_key()
    b = server.backend

    text, pat_txt = args.string, args.pattern
    L = len(text) + 1  # STRING_PADDING = 1
    m = len(pat_txt)
    want = int(pat_txt in text)

    fence = jax.jit(lambda lo: lo.ravel()[::97].astype(jnp.uint32).sum())

    for Q in args.queries:
        encs = [ck.encrypt(text, padding=1) for _ in range(Q)]
        pats = [ck.encrypt_no_padding(pat_txt) for _ in range(Q)]
        sb = Blocks(U64(jnp.stack([e.blocks.ct.lo for e in encs]),
                        jnp.stack([e.blocks.ct.hi for e in encs])), 3, 1.0)
        pb = Blocks(U64(jnp.stack([p.blocks.ct.lo for p in pats]),
                        jnp.stack([p.blocks.ct.hi for p in pats])), 3, 1.0)

        metrics.reset()
        with metrics.measure(f"contains_q{Q}",
                             sync=lambda: np.asarray(fence(out_holder[0].ct.lo))
                             if out_holder else None):
            out_holder = [batched_contains(b, sb, pb, L, m)]
        rec = metrics.last()
        pbs_total = rec.pbs_items

        t0 = time.time()
        out = batched_contains(b, sb, pb, L, m)
        np.asarray(fence(out.ct.lo))
        warm0 = time.time() - t0
        best = warm0
        for _ in range(args.reps):
            t0 = time.time()
            out = batched_contains(b, sb, pb, L, m)
            np.asarray(fence(out.ct.lo))
            best = min(best, time.time() - t0)

        # correctness: every query decodes to the oracle bit
        ones = b.trivial_chars(np.ones(Q, np.uint8))
        chars = b.mul_bit(ones, out)
        got = [ck.decrypt_char(_wrap_bit(chars, i)) for i in range(Q)]
        ok = all(g == want for g in got)

        print(json.dumps({
            "metric": "serving_contains",
            "params": params.name,
            "queries": Q,
            "string_len": L,
            "pattern_len": m,
            "pbs_per_query": pbs_total / Q,
            "wall_s": round(best, 4),
            "queries_per_s": round(Q / best, 2),
            "achieved_pbs_per_s": round(pbs_total / best, 1),
            "ok": ok,
        }), flush=True)


def _wrap_bit(out, i):
    import jax

    from fhestring_tpu.ciphertext import FheChar

    return FheChar(jax.tree.map(lambda x: x[i], out))


if __name__ == "__main__":
    main()
