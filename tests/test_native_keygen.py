"""C++ keygen (native/keygen.cpp) produces working TFHE keys.

Functional validation (not draw-order parity with the NumPy keygen):
secret/evaluation keys generated natively must encrypt, bootstrap and
keyswitch correctly through the NumPy oracle pipeline, and be
deterministic in the AES key.
"""

import numpy as np
import pytest

from fhestring_tpu import PARAM_TEST_NOISY, native
from fhestring_tpu import numpy_ref as ref

pytestmark = pytest.mark.skipif(
    not native.keygen_available(), reason="no C++ compiler")

KEY = (123).to_bytes(16, "little")


@pytest.fixture(scope="module")
def keys():
    return native.keygen_native(PARAM_TEST_NOISY, KEY)


def test_secret_keys_are_binary(keys):
    sk, srv = keys
    assert set(np.unique(sk.lwe_sk)) <= {0, 1}
    assert set(np.unique(sk.glwe_sk)) <= {0, 1}
    # keys are not degenerate
    assert 0 < sk.lwe_sk.sum() < sk.lwe_sk.size
    assert 0 < sk.glwe_sk.sum() < sk.glwe_sk.size


def test_deterministic_in_key():
    a = native.keygen_native(PARAM_TEST_NOISY, KEY)
    b = native.keygen_native(PARAM_TEST_NOISY, KEY)
    np.testing.assert_array_equal(a[0].lwe_sk, b[0].lwe_sk)
    np.testing.assert_array_equal(a[1].bsk, b[1].bsk)
    c = native.keygen_native(PARAM_TEST_NOISY, (7).to_bytes(16, "little"))
    assert not np.array_equal(a[1].bsk, c[1].bsk)


def test_encrypt_decrypt_roundtrip(keys):
    sk, _ = keys
    rng = np.random.default_rng(0)
    for m in [0, 3, 7, 15]:
        ct = ref.shortint_encrypt(sk, m, rng)
        assert ref.shortint_decrypt(sk, ct) == m


def test_pbs_with_native_keys(keys):
    """Full KS -> PBS pipeline under natively-generated evaluation keys."""
    sk, srv = keys
    rng = np.random.default_rng(1)
    table = [(3 * m + 1) % 16 for m in range(16)]
    for m in [0, 5, 9, 15]:
        ct = ref.shortint_encrypt(sk, m, rng)
        out = ref.pbs(ct, table, srv)
        assert ref.shortint_decrypt(sk, out) == table[m]


def test_client_key_native_flag():
    from fhestring_tpu.client import ClientKey

    ck = ClientKey(PARAM_TEST_NOISY, seed=3, native_keygen=True)
    srv = ck.get_server_key()
    s = ck.encrypt("native!", 1)
    assert ck.decrypt(s) == "native!"
    assert ck.decrypt_char(srv.len(s)) == 7
