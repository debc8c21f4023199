"""Native AES-CTR CSPRNG: build, determinism, AES correctness, key usage."""

import numpy as np
import pytest

from fhestring_tpu.native import SecureRng, _load


def test_builds_and_loads():
    lib = _load()
    assert lib is not None, "g++ must be able to build the native csprng"


def test_aes128_known_answer():
    """FIPS-197 appendix C.1-style check: AES-128 of the zero counter under a
    known key, via the CTR keystream."""
    import ctypes

    lib = _load()
    key = bytes(range(16))  # 000102...0f
    out = np.empty(16, dtype=np.uint8)
    lib.aes128_ctr_fill(out.ctypes.data_as(ctypes.c_void_p), 16, key, 0)
    # AES-128-ECB(key=000102..0f, pt=0^16) == c6a13b37878f5b826f4f8162a1c8d879
    assert out.tobytes().hex() == "c6a13b37878f5b826f4f8162a1c8d879"


def test_deterministic_given_key():
    a = SecureRng(key=b"0123456789abcdef")
    b = SecureRng(key=b"0123456789abcdef")
    np.testing.assert_array_equal(
        a.integers(0, 1 << 64, 100, dtype=np.uint64),
        b.integers(0, 1 << 64, 100, dtype=np.uint64))


def test_distinct_keys_distinct_streams():
    a = SecureRng(key=b"0123456789abcdef")
    b = SecureRng(key=b"0123456789abcdeg")
    assert not np.array_equal(a.integers(0, 1 << 64, 10, dtype=np.uint64),
                              b.integers(0, 1 << 64, 10, dtype=np.uint64))


def test_integers_ranges():
    rng = SecureRng(seed=5)
    bits = rng.integers(0, 2, 1000)
    assert set(np.unique(bits)) <= {0, 1}
    assert 300 < bits.sum() < 700
    u64 = rng.integers(0, 1 << 64, 100, dtype=np.uint64)
    assert u64.dtype == np.uint64


def test_normal_moments():
    rng = SecureRng(seed=6)
    z = rng.normal(0.0, 2.0, 20000)
    assert abs(z.mean()) < 0.1
    assert abs(z.std() - 2.0) < 0.1


def test_keygen_accepts_secure_rng():
    from fhestring_tpu import PARAM_TEST_ZERO_NOISE
    from fhestring_tpu import numpy_ref as ref

    rng = SecureRng(seed=7)
    sk, srv = ref.keygen(PARAM_TEST_ZERO_NOISE, rng)
    ct = ref.shortint_encrypt(sk, 9, rng)
    assert ref.shortint_decrypt(sk, ct) == 9
