"""Pallas external-product kernel vs jnp reference (interpret mode on CPU)."""

import numpy as np
import pytest

from fhestring_tpu.crypto.kernels.ext_product import (
    ext_product_planes_reference,
    ext_product_u64,
    recombine_planes_numpy,
)


def naive_planes(drev, p4, n_poly):
    """Schoolbook oracle: out[b,j,s,t] = sum_{la+lb=s,i,c} D*M."""
    num_la, B, kn = drev.shape
    num_r = p4.shape[0]
    kp1 = p4.shape[1]
    two_n = 2 * n_poly
    p2 = p4[..., :two_n].astype(np.int64)
    d = drev.reshape(num_la, B, num_r, n_poly).astype(np.int64)
    out = np.zeros((B, kp1, 8, n_poly), np.int64)
    for s in range(8):
        for la in range(num_la):
            lb = s - la
            if lb < 0 or lb >= 8:
                continue
            for i in range(num_r):
                for cp in range(n_poly):
                    c = n_poly - 1 - cp
                    # M[c, t] = p2[(t - c) mod 2N]
                    idx = (np.arange(n_poly) - c) % two_n
                    rows = p2[i][:, lb][:, idx]  # [jout, N]
                    out[:, :, s, :] += (
                        d[la, :, i, cp][:, None, None] * rows[None, :, :])
    return out.astype(np.int32)


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    n_poly, kp1, B, num_la = 256, 2, 8, 3
    drev = rng.integers(-128, 128, size=(num_la, B, kp1 * n_poly)).astype(np.int8)
    p2 = rng.integers(-128, 128, size=(kp1, kp1, 8, 2 * n_poly)).astype(np.int8)
    p4 = np.concatenate([p2, p2], axis=-1)
    return drev, p4, n_poly


def test_reference_vs_naive_small():
    rng = np.random.default_rng(1)
    n_poly, kp1, B, num_la = 128, 2, 2, 3
    drev = rng.integers(-4, 4, size=(num_la, B, kp1 * n_poly)).astype(np.int8)
    p2 = rng.integers(-4, 4, size=(kp1, kp1, 8, 2 * n_poly)).astype(np.int8)
    p4 = np.concatenate([p2, p2], axis=-1)
    ref = np.asarray(ext_product_planes_reference(drev, p4, n_poly=n_poly))
    want = naive_planes(drev, p4, n_poly)
    np.testing.assert_array_equal(ref, want)


def test_pallas_interpret_matches_reference(data):
    drev, p4, n_poly = data
    planes = np.asarray(ext_product_planes_reference(drev, p4, n_poly=n_poly))
    # reference planes [B, kp1, 8, N] -> recombined u64 limbs
    want_lo, want_hi = recombine_planes_numpy(np.moveaxis(planes, 2, -2))
    got_lo, got_hi = ext_product_u64(drev, p4, n_poly=n_poly, b_tile=8,
                                     interpret=True)
    np.testing.assert_array_equal(np.asarray(got_lo), want_lo)
    np.testing.assert_array_equal(np.asarray(got_hi), want_hi)
