"""Tests for the NumPy reference TFHE implementation (the correctness oracle).

Covers: torus polynomial algebra, gadget decomposition, LWE/GLWE round trips,
external products, blind rotation, sample extraction, keyswitch, and full
programmable bootstraps for representative LUTs.
"""

import numpy as np
import pytest

from fhestring_tpu import PARAM_TEST_NOISY, PARAM_TEST_ZERO_NOISE
from fhestring_tpu import numpy_ref as ref

U64 = np.uint64


def naive_negacyclic(a, b):
    """Schoolbook negacyclic product via Python ints mod 2**64."""
    n = len(a)
    out = [0] * n
    for i in range(n):
        for j in range(n):
            t = (i + j) % n
            sign = -1 if i + j >= n else 1
            out[t] = (out[t] + sign * int(a[i]) * int(b[j])) % (1 << 64)
    return np.array(out, dtype=U64)


class TestPolyAlgebra:
    def test_polymul_matches_schoolbook(self):
        rng = np.random.default_rng(0)
        a = rng.integers(0, 1 << 64, size=16, dtype=U64)
        b = rng.integers(0, 1 << 64, size=16, dtype=U64)
        np.testing.assert_array_equal(ref.polymul(a, b), naive_negacyclic(a, b))

    def test_rotate_is_monomial_mul(self):
        rng = np.random.default_rng(1)
        a = rng.integers(0, 1 << 64, size=32, dtype=U64)
        for amount in [0, 1, 5, 31, 32, 33, 63, 64, 65, 127]:
            mono = np.zeros(32, dtype=U64)
            amt = amount % 64
            if amt < 32:
                mono[amt] = U64(1)
            else:
                mono[amt - 32] = U64(0) - U64(1)
            np.testing.assert_array_equal(
                ref.poly_rotate(a, amount), ref.polymul(a, mono), err_msg=str(amount)
            )

    def test_rotate_negative(self):
        rng = np.random.default_rng(2)
        a = rng.integers(0, 1 << 64, size=32, dtype=U64)
        np.testing.assert_array_equal(
            ref.poly_rotate(ref.poly_rotate(a, -7), 7), a
        )


class TestDecomposition:
    @pytest.mark.parametrize("base_log,levels", [(23, 1), (3, 5), (8, 4), (16, 2)])
    def test_recomposition_error_bound(self, base_log, levels):
        rng = np.random.default_rng(3)
        v = rng.integers(0, 1 << 64, size=1000, dtype=U64)
        digits = ref.decompose(v, base_log, levels)
        base = 1 << base_log
        assert digits.max() <= base // 2 and digits.min() >= -(base // 2)
        recomp = np.zeros_like(v)
        for lev in range(levels):
            g = ref.gadget_factor(lev, base_log, levels)
            recomp += digits[lev].astype(U64) * U64(g % (1 << 64))
        err = (v - recomp).astype(np.int64)  # signed distance
        bound = 1 << (64 - base_log * levels - 1)
        assert np.abs(err).max() <= bound + 1


class TestLweGlwe:
    def test_lwe_roundtrip_zero_noise(self):
        p = PARAM_TEST_ZERO_NOISE
        rng = np.random.default_rng(4)
        sk, _ = ref.keygen(p, rng)
        for m in range(16):
            ct = ref.shortint_encrypt(sk, m, rng)
            assert ref.shortint_decrypt(sk, ct) == m

    def test_lwe_roundtrip_noisy(self):
        p = PARAM_TEST_NOISY
        rng = np.random.default_rng(5)
        sk, _ = ref.keygen(p, rng)
        for m in range(16):
            ct = ref.shortint_encrypt(sk, m, rng)
            assert ref.shortint_decrypt(sk, ct) == m

    def test_glwe_zero_phase(self):
        p = PARAM_TEST_ZERO_NOISE
        rng = np.random.default_rng(6)
        sk, _ = ref.keygen(p, rng)
        ct = ref.glwe_encrypt_zero(sk, rng)
        phase = ref.glwe_decrypt(sk, ct)
        np.testing.assert_array_equal(phase, np.zeros(p.polynomial_size, dtype=U64))

    def test_lwe_linear_ops(self):
        p = PARAM_TEST_ZERO_NOISE
        rng = np.random.default_rng(7)
        sk, _ = ref.keygen(p, rng)
        a = ref.shortint_encrypt(sk, 2, rng)
        b = ref.shortint_encrypt(sk, 3, rng)
        assert ref.shortint_decrypt(sk, a + b) == 5
        assert ref.shortint_decrypt(sk, a * U64(4) + b) == 11
        triv = ref.lwe_trivial(p.big_lwe_dimension, ref.encode(1, p))
        assert ref.shortint_decrypt(sk, triv + a) == 3


class TestExternalProduct:
    @pytest.mark.parametrize("param", [PARAM_TEST_ZERO_NOISE, PARAM_TEST_NOISY])
    def test_external_product_selects_bit(self, param):
        rng = np.random.default_rng(8)
        sk, srv = ref.keygen(param, rng)
        p = param
        # GLWE encrypting a known poly (trivial: zero-enc + plaintext in body)
        msg = np.zeros(p.polynomial_size, dtype=U64)
        msg[0] = ref.encode(5, p)
        msg[3] = ref.encode(9, p)
        glwe = ref.glwe_encrypt_zero(sk, rng)
        glwe[p.glwe_dimension] = glwe[p.glwe_dimension] + msg
        # find a secret key bit of each value to test both branches
        for want in (0, 1):
            idx = int(np.nonzero(sk.lwe_sk == want)[0][0])
            out = ref.external_product(srv.bsk[idx], glwe, p)
            phase = ref.glwe_decrypt(sk, out)
            got0 = ref.decode(phase[0], p) % p.plaintext_space
            got3 = ref.decode(phase[3], p) % p.plaintext_space
            assert (got0, got3) == ((5, 9) if want else (0, 0))

    def test_cmux(self):
        p = PARAM_TEST_ZERO_NOISE
        rng = np.random.default_rng(9)
        sk, srv = ref.keygen(p, rng)
        d0 = np.zeros((p.glwe_dimension + 1, p.polynomial_size), dtype=U64)
        d1 = np.zeros_like(d0)
        d0[p.glwe_dimension, 0] = ref.encode(3, p)
        d1[p.glwe_dimension, 0] = ref.encode(12, p)
        for want in (0, 1):
            idx = int(np.nonzero(sk.lwe_sk == want)[0][0])
            out = ref.cmux(srv.bsk[idx], d0, d1, p)
            phase = ref.glwe_decrypt(sk, out)
            assert ref.decode(phase[0], p) % p.plaintext_space == (12 if want else 3)


class TestKeyswitch:
    @pytest.mark.parametrize("param", [PARAM_TEST_ZERO_NOISE, PARAM_TEST_NOISY])
    def test_keyswitch_preserves_plaintext(self, param):
        rng = np.random.default_rng(10)
        sk, srv = ref.keygen(param, rng)
        for m in [0, 1, 7, 15]:
            ct = ref.shortint_encrypt(sk, m, rng)
            ct_small = ref.keyswitch(ct, srv)
            phase = ref.lwe_decrypt_raw(sk.lwe_sk, ct_small)
            assert ref.decode(phase, param) % param.plaintext_space == m


class TestPBS:
    @pytest.mark.parametrize("param", [PARAM_TEST_ZERO_NOISE, PARAM_TEST_NOISY])
    def test_identity_lut(self, param):
        rng = np.random.default_rng(11)
        sk, srv = ref.keygen(param, rng)
        table = list(range(16))
        for m in range(16):
            ct = ref.shortint_encrypt(sk, m, rng)
            out = ref.pbs(ct, table, srv)
            assert ref.shortint_decrypt(sk, out) == m

    def test_arbitrary_lut(self):
        p = PARAM_TEST_ZERO_NOISE
        rng = np.random.default_rng(12)
        sk, srv = ref.keygen(p, rng)
        table = [(3 * m + 1) % 16 for m in range(16)]
        for m in range(16):
            ct = ref.shortint_encrypt(sk, m, rng)
            out = ref.pbs(ct, table, srv)
            assert ref.shortint_decrypt(sk, out) == table[m]

    def test_pbs_on_trivial_and_linear_combo(self):
        """Bivariate pattern: LUT(4x + y) — the workhorse of the radix layer."""
        p = PARAM_TEST_ZERO_NOISE
        rng = np.random.default_rng(13)
        sk, srv = ref.keygen(p, rng)
        table = [1 if (u >> 2) == (u & 3) else 0 for u in range(16)]  # x == y
        for x, y in [(0, 0), (1, 3), (2, 2), (3, 1), (3, 3)]:
            ctx = ref.shortint_encrypt(sk, x, rng)
            cty = ref.shortint_encrypt(sk, y, rng)
            packed = ctx * U64(4) + cty
            out = ref.pbs(packed, table, srv)
            assert ref.shortint_decrypt(sk, out) == (1 if x == y else 0)

    def test_pbs_output_noise_small(self):
        """PBS output must decode correctly even from a noisy input."""
        p = PARAM_TEST_NOISY
        rng = np.random.default_rng(14)
        sk, srv = ref.keygen(p, rng)
        table = [m ^ 1 for m in range(16)]
        for m in [0, 5, 15]:
            ct = ref.shortint_encrypt(sk, m, rng)
            out = ref.pbs(ct, table, srv)
            assert ref.shortint_decrypt(sk, out) == table[m]
