"""Fused whole-blind-rotation kernel: bit-exact vs the step-by-step path."""

import numpy as np
import pytest

import jax.numpy as jnp

from fhestring_tpu import torus
from fhestring_tpu.crypto import keys as dkeys
from fhestring_tpu.crypto import pbs as dpbs
from fhestring_tpu.crypto.kernels.blind_rotate_fused import (
    blind_rotate_fused, pack_fused_consts)
from fhestring_tpu.numpy_ref import core as ref
from fhestring_tpu.params import PARAM_TEST_ZERO_NOISE


@pytest.mark.parametrize("B", [64, 128])
def test_fused_matches_stepwise(B):
    p = PARAM_TEST_ZERO_NOISE
    rng = np.random.default_rng(7)
    sk, srv = ref.keygen(p, rng)
    dev = dkeys.pack_server_keys(srv, with_ntt2=True)

    N, kp1 = p.polynomial_size, p.glwe_dimension + 1
    acc0 = rng.integers(0, 1 << 64, size=(B, kp1, N), dtype=np.uint64)
    lwe = np.zeros((B, p.lwe_dimension + 1), np.int32)
    lwe[:, :-1] = rng.integers(0, 2 * N, size=(B, p.lwe_dimension))

    acc = torus.from_numpy(acc0)
    want = torus.to_numpy(dpbs.blind_rotate(acc, jnp.asarray(lwe), dev))

    consts = pack_fused_consts(N)
    amounts = jnp.asarray(lwe[:, :p.lwe_dimension])
    lo, hi = blind_rotate_fused(acc.lo, acc.hi, amounts, dev.bsk_ntt2,
                                consts, n_poly=N, base_log=p.pbs_base_log,
                                b_tile=64, interpret=True)
    got = np.asarray(lo).astype(np.uint64) | (
        np.asarray(hi).astype(np.uint64) << np.uint64(32))
    np.testing.assert_array_equal(got, want)


def test_fused_rounded_matches_numpy_rounded_oracle():
    """rounded=True is bit-identical to numpy_ref.blind_rotate(rounded=True)
    (NOT to the exact path — the decomposition is deliberately approximate;
    plaintext-equivalence is covered by the noise-calibration suite)."""
    p = PARAM_TEST_ZERO_NOISE
    rng = np.random.default_rng(13)
    sk, srv = ref.keygen(p, rng)
    dev = dkeys.pack_server_keys(srv, with_ntt2=True)

    B, N, kp1 = 64, p.polynomial_size, p.glwe_dimension + 1
    acc0 = rng.integers(0, 1 << 64, size=(B, kp1, N), dtype=np.uint64)
    lwe = np.zeros((B, p.lwe_dimension + 1), np.int32)
    lwe[:, :-1] = rng.integers(0, 2 * N, size=(B, p.lwe_dimension))

    want = np.stack([
        ref.blind_rotate(acc0[i], lwe[i].astype(np.int64), srv, rounded=True)
        for i in range(B)])

    acc = torus.from_numpy(acc0)
    consts = pack_fused_consts(N)
    amounts = jnp.asarray(lwe[:, :p.lwe_dimension])
    lo, hi = blind_rotate_fused(acc.lo, acc.hi, amounts, dev.bsk_ntt2,
                                consts, n_poly=N, base_log=p.pbs_base_log,
                                b_tile=64, interpret=True, rounded=True)
    got = np.asarray(lo).astype(np.uint64) | (
        np.asarray(hi).astype(np.uint64) << np.uint64(32))
    np.testing.assert_array_equal(got, want)


def test_fused_rounded_approx_matches_plane_truncated_oracle():
    """rounded=True, approx=True (the production fast mode) is bit-identical
    to numpy_ref.blind_rotate(rounded=True, min_shift=3): the external
    product drops shift planes below 256^3 (budgeted low-order noise, the
    analog of tfhe-rs's f64 FFT error)."""
    p = PARAM_TEST_ZERO_NOISE
    rng = np.random.default_rng(17)
    sk, srv = ref.keygen(p, rng)
    dev = dkeys.pack_server_keys(srv, with_ntt2=True)

    B, N, kp1 = 64, p.polynomial_size, p.glwe_dimension + 1
    acc0 = rng.integers(0, 1 << 64, size=(B, kp1, N), dtype=np.uint64)
    lwe = np.zeros((B, p.lwe_dimension + 1), np.int32)
    lwe[:, :-1] = rng.integers(0, 2 * N, size=(B, p.lwe_dimension))

    want = np.stack([
        ref.blind_rotate(acc0[i], lwe[i].astype(np.int64), srv,
                         rounded=True, min_shift=3)
        for i in range(B)])

    acc = torus.from_numpy(acc0)
    consts = pack_fused_consts(N)
    amounts = jnp.asarray(lwe[:, :p.lwe_dimension])
    lo, hi = blind_rotate_fused(acc.lo, acc.hi, amounts, dev.bsk_ntt2,
                                consts, n_poly=N, base_log=p.pbs_base_log,
                                b_tile=64, interpret=True, rounded=True,
                                approx=True)
    got = np.asarray(lo).astype(np.uint64) | (
        np.asarray(hi).astype(np.uint64) << np.uint64(32))
    np.testing.assert_array_equal(got, want)


def test_fused_path_honors_nonzero_b():
    """blind_rotate(use_fused=True) must apply the initial -b rotation that
    the fused kernel itself doesn't handle (its amounts exclude b)."""
    p = PARAM_TEST_ZERO_NOISE
    rng = np.random.default_rng(11)
    sk, srv = ref.keygen(p, rng)
    dev = dkeys.pack_server_keys(srv, with_ntt2=True)

    B, N, kp1 = 64, p.polynomial_size, p.glwe_dimension + 1
    acc0 = rng.integers(0, 1 << 64, size=(B, kp1, N), dtype=np.uint64)
    lwe = rng.integers(0, 2 * N, size=(B, p.lwe_dimension + 1)) \
        .astype(np.int32)  # last column b deliberately nonzero

    acc = torus.from_numpy(acc0)
    want = torus.to_numpy(dpbs.blind_rotate(acc, jnp.asarray(lwe), dev))
    got = torus.to_numpy(
        dpbs.blind_rotate(acc, jnp.asarray(lwe), dev, use_fused=True))
    np.testing.assert_array_equal(got, want)
