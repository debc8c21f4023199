"""Tests for u64-on-2xuint32 torus arithmetic against Python big ints."""

import numpy as np
import pytest

from fhestring_tpu import torus

M = 1 << 64


@pytest.fixture
def vals():
    rng = np.random.default_rng(0)
    edge = np.array(
        [0, 1, 2**32 - 1, 2**32, 2**32 + 1, 2**63, 2**64 - 1, 2**64 - 2**32],
        dtype=np.uint64,
    )
    rand = rng.integers(0, M, size=64, dtype=np.uint64)
    return np.concatenate([edge, rand])


def test_roundtrip(vals):
    np.testing.assert_array_equal(torus.to_numpy(torus.from_numpy(vals)), vals)


def test_add_sub_neg(vals):
    a, b = vals, np.roll(vals, 1)
    da, db = torus.from_numpy(a), torus.from_numpy(b)
    np.testing.assert_array_equal(torus.to_numpy(torus.add(da, db)), a + b)
    np.testing.assert_array_equal(torus.to_numpy(torus.sub(da, db)), a - b)
    np.testing.assert_array_equal(torus.to_numpy(torus.neg(da)), np.uint64(0) - a)


def test_mul_u32(vals):
    rng = np.random.default_rng(1)
    c = rng.integers(0, 1 << 32, size=vals.shape, dtype=np.uint64)
    got = torus.to_numpy(
        torus.mul_u32(torus.from_numpy(vals), torus.from_numpy(c).lo)
    )
    np.testing.assert_array_equal(got, vals * c)


def test_mul_small(vals):
    for c in [0, 1, 4, 15, 255]:
        got = torus.to_numpy(torus.mul_small(torus.from_numpy(vals), c))
        np.testing.assert_array_equal(got, vals * np.uint64(c))


@pytest.mark.parametrize("k", [0, 1, 8, 31, 32, 33, 41, 63, 64])
def test_shifts(vals, k):
    d = torus.from_numpy(vals)
    np.testing.assert_array_equal(
        torus.to_numpy(torus.shl(d, k)), vals << np.uint64(k) if k < 64 else np.zeros_like(vals)
    )
    np.testing.assert_array_equal(
        torus.to_numpy(torus.shr(d, k)), vals >> np.uint64(k) if k < 64 else np.zeros_like(vals)
    )


@pytest.mark.parametrize("k", [1, 12, 31, 32, 41, 52])
def test_round_shr(vals, k):
    got = torus.to_numpy(torus.round_shr(torus.from_numpy(vals), k))
    want = (vals + np.uint64(1 << (k - 1))) >> np.uint64(k)
    np.testing.assert_array_equal(got, want)


def test_from_int32():
    v = np.array([0, 1, -1, 2**31 - 1, -(2**31)], dtype=np.int32)
    got = torus.to_numpy(torus.from_int32(torus.from_numpy(v.astype(np.uint64)).lo.astype(np.int32)))
    want = v.astype(np.int64).astype(np.uint64)
    np.testing.assert_array_equal(got, want)


def test_sum_axis():
    rng = np.random.default_rng(2)
    a = rng.integers(0, M, size=(37, 253), dtype=np.uint64)
    got = torus.to_numpy(torus.sum_axis(torus.from_numpy(a), axis=1))
    np.testing.assert_array_equal(got, a.sum(axis=1, dtype=np.uint64))


def test_add_scalar(vals):
    for c in [0, 1, M - 1, 1 << 40]:
        got = torus.to_numpy(torus.add_scalar(torus.from_numpy(vals), c))
        np.testing.assert_array_equal(got, vals + np.uint64(c))
