"""32-bit-torus (turbo) fused blind-rotation kernel: bit-exact vs oracle.

The 32-bit mode is the reduced-precision torus of params.torus_bits=32:
every torus value is a multiple of 2^32, digits are single int8 limbs,
keys have 4 nonzero byte-limb planes, and the kernel carries one u32
accumulator plane with an exact 2-prime CRT (blind_rotate_fused32.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fhestring_tpu import torus
from fhestring_tpu.crypto import keys as dkeys
from fhestring_tpu.crypto import pbs as dpbs
from fhestring_tpu.crypto.kernels.blind_rotate_fused32 import (
    blind_rotate_fused32, pack_fused32_consts)
from fhestring_tpu.numpy_ref import core as ref
from fhestring_tpu.params import PARAM_TEST32_STAT, PARAM_TEST32_ZERO_NOISE


def _subgroup_acc(rng, shape):
    """Random u64 accumulator valued in the 32-bit subgroup."""
    return rng.integers(0, 1 << 32, size=shape, dtype=np.uint64) << np.uint64(32)


@pytest.mark.parametrize("B", [64, 128])
def test_fused32_exact_matches_oracle(B):
    p = PARAM_TEST32_ZERO_NOISE
    rng = np.random.default_rng(7)
    sk, srv = ref.keygen(p, rng)
    dev = dkeys.pack_server_keys(srv, with_ntt2=True)
    assert dev.bsk_ntt32 is not None and dev.bsk_ntt2 is None

    N, kp1 = p.polynomial_size, p.glwe_dimension + 1
    acc0 = _subgroup_acc(rng, (B, kp1, N))
    lwe = np.zeros((B, p.lwe_dimension + 1), np.int32)
    lwe[:, :-1] = rng.integers(0, 2 * N, size=(B, p.lwe_dimension))

    want = np.stack([
        ref.blind_rotate(acc0[i], lwe[i].astype(np.int64), srv)
        for i in range(B)])
    assert (want % (1 << 32) == 0).all()  # subgroup closure

    consts = pack_fused32_consts(N)
    amounts = jnp.asarray(lwe[:, :p.lwe_dimension])
    acc = torus.from_numpy(acc0)
    hi = blind_rotate_fused32(acc.hi, amounts, dev.bsk_ntt32, consts,
                              n_poly=N, base_log=p.pbs_base_log,
                              ell=p.pbs_level, b_tile=64, interpret=True)
    got = np.asarray(hi).astype(np.uint64) << np.uint64(32)
    np.testing.assert_array_equal(got, want)


def test_fused32_halves_interpret_matches_oracle_and_stage_major():
    """GENUINELY exercise halves=True (the production default schedule):
    B=128, b_tile=128 at N=256 gives C=2, so the wrapper does NOT clamp to
    the stage-major fallback (blind_rotate_fused32 disables halves when
    C % 2 != 0 — every other CI shape lands there).  Asserts bit-identity
    against BOTH the stage-major kernel and the numpy oracle, so a
    regression in the interleaved chain wiring fails CI rather than only
    the opt-in on-TPU micro-bench cross-check."""
    p = PARAM_TEST32_ZERO_NOISE
    rng = np.random.default_rng(43)
    sk, srv = ref.keygen(p, rng)
    dev = dkeys.pack_server_keys(srv, with_ntt2=True)

    B, N, kp1 = 128, p.polynomial_size, p.glwe_dimension + 1
    acc0 = _subgroup_acc(rng, (B, kp1, N))
    lwe = np.zeros((B, p.lwe_dimension + 1), np.int32)
    lwe[:, :-1] = rng.integers(0, 2 * N, size=(B, p.lwe_dimension))

    want = np.stack([
        ref.blind_rotate(acc0[i], lwe[i].astype(np.int64), srv)
        for i in range(B)])

    consts = pack_fused32_consts(N)
    amounts = jnp.asarray(lwe[:, :p.lwe_dimension])
    acc = torus.from_numpy(acc0)
    kw = dict(n_poly=N, base_log=p.pbs_base_log, ell=p.pbs_level,
              b_tile=128, interpret=True)
    hi_h = blind_rotate_fused32(acc.hi, amounts, dev.bsk_ntt32, consts,
                                halves=True, **kw)
    hi_s = blind_rotate_fused32(acc.hi, amounts, dev.bsk_ntt32, consts,
                                halves=False, **kw)
    got = np.asarray(hi_h).astype(np.uint64) << np.uint64(32)
    np.testing.assert_array_equal(np.asarray(hi_h), np.asarray(hi_s))
    np.testing.assert_array_equal(got, want)


def test_fused32_approx_matches_plane_truncated_oracle():
    """approx=True drops kernel plane s'=0 == u64 limb plane 4, i.e. the
    numpy_ref.blind_rotate(min_shift=5) oracle. (Not used in production for
    the 32-bit set — the dropped plane is too coarse there — but the mode
    must stay bit-exact against its spec.)"""
    p = PARAM_TEST32_ZERO_NOISE
    rng = np.random.default_rng(17)
    sk, srv = ref.keygen(p, rng)
    dev = dkeys.pack_server_keys(srv, with_ntt2=True)

    B, N, kp1 = 64, p.polynomial_size, p.glwe_dimension + 1
    acc0 = _subgroup_acc(rng, (B, kp1, N))
    lwe = np.zeros((B, p.lwe_dimension + 1), np.int32)
    lwe[:, :-1] = rng.integers(0, 2 * N, size=(B, p.lwe_dimension))

    want = np.stack([
        ref.blind_rotate(acc0[i], lwe[i].astype(np.int64), srv, min_shift=5)
        for i in range(B)])

    consts = pack_fused32_consts(N)
    amounts = jnp.asarray(lwe[:, :p.lwe_dimension])
    acc = torus.from_numpy(acc0)
    hi = blind_rotate_fused32(acc.hi, amounts, dev.bsk_ntt32, consts,
                              n_poly=N, base_log=p.pbs_base_log,
                              ell=p.pbs_level, b_tile=64, interpret=True,
                              approx=True)
    got = np.asarray(hi).astype(np.uint64) << np.uint64(32)
    np.testing.assert_array_equal(got, want)


def test_keyswitch32_matches_oracle():
    """4-plane KSK matmul (low planes dropped) == the u64 oracle keyswitch."""
    p = PARAM_TEST32_STAT
    rng = np.random.default_rng(3)
    sk, srv = ref.keygen(p, rng)
    dev = dkeys.pack_server_keys(srv)
    assert dev.ksk_limbs.shape[1] == (p.lwe_dimension + 1) * 4

    B = 16
    cts = np.stack([ref.shortint_encrypt(sk, int(m % 16), rng)
                    for m in range(B)])
    want = np.stack([ref.keyswitch(cts[i], srv) for i in range(B)])
    got = torus.to_numpy(dpbs.keyswitch(torus.from_numpy(cts), dev))
    np.testing.assert_array_equal(got, want)
    assert (got % (1 << 32) == 0).all()


@pytest.mark.parametrize("pset", [PARAM_TEST32_ZERO_NOISE, PARAM_TEST32_STAT])
def test_pbs_batch_fused32_end_to_end(pset):
    """Full KS->MS->fused32 rotation->extract == oracle ref.pbs, bit-exact,
    and decodes to the right LUT outputs."""
    rng = np.random.default_rng(5)
    sk, srv = ref.keygen(pset, rng)
    dev = dkeys.pack_server_keys(srv, with_ntt2=True)

    table = [(7 * x + 3) % 16 for x in range(16)]
    bank = dkeys.pack_luts([table], pset)
    msgs = rng.integers(0, 16, size=32)
    cts = np.stack([ref.shortint_encrypt(sk, int(m), rng) for m in msgs])

    want = np.stack([ref.pbs(cts[i], table, srv) for i in range(len(msgs))])
    out = dpbs.pbs_batch(torus.from_numpy(cts),
                         jnp.zeros(len(msgs), jnp.int32), bank, dev,
                         use_fused=True)
    got = torus.to_numpy(out)
    np.testing.assert_array_equal(got, want)
    for i, m in enumerate(msgs):
        assert ref.shortint_decrypt(sk, got[i]) == table[m]
