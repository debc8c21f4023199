"""Pallas negacyclic CRT-NTT external-product kernel (kernels/ntt_ext.py):
bit-exact vs the NumPy reference (ntt2.ext_u64_ntt2_numpy) and hence vs the
matmul path, in interpret mode."""

import numpy as np
import pytest

from fhestring_tpu.crypto import ntt2
from fhestring_tpu.crypto.kernels import ntt_ext


def _digit_limbs_np(digits, num_la=3):
    out = []
    state = digits.astype(np.int64)
    for _ in range(num_la):
        l = ((state + 128) % 256) - 128
        out.append(l.astype(np.int8))
        state = (state - l) >> 8
    return np.stack(out, axis=-1)


@pytest.mark.parametrize("n,B", [(256, 64), (256, 128)])
def test_kernel_matches_numpy_reference(n, B):
    import jax.numpy as jnp

    from fhestring_tpu.crypto.keys import balanced_limbs_u64

    rng = np.random.default_rng(5)
    R, kp1 = 2, 2
    digits = rng.integers(-(1 << 22), (1 << 22) + 1, size=(B, R, n))
    dl = _digit_limbs_np(digits)                        # [B, R, N, La]
    key = rng.integers(0, 1 << 64, size=(R, kp1, n), dtype=np.uint64)
    raw_limbs = np.moveaxis(balanced_limbs_u64(key), -1, -2)
    khat = ntt2.key_hats(raw_limbs, n)                  # [3, R, kp1, 8, N]

    lo_ref, hi_ref = ntt2.ext_u64_ntt2_numpy(dl, khat, n)

    n1 = 128
    khat6 = khat.reshape(khat.shape[:-1] + (n // n1, n1))
    consts = ntt_ext.pack_neg_consts(n)
    dlk = np.transpose(dl, (3, 0, 1, 2)).reshape(3, B, R * n)
    lo, hi = ntt_ext.ntt_ext_u64(jnp.asarray(dlk), jnp.asarray(khat6),
                                 consts, n_poly=n, b_tile=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(lo), lo_ref)
    np.testing.assert_array_equal(np.asarray(hi), hi_ref)
