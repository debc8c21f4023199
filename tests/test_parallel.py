"""Multi-chip sharding on the 8-device virtual CPU mesh.

The real deployment shards the PBS batch axis (string positions x blocks)
across chips (SURVEY.md section 2.4); these tests prove the sharded paths
are bit-identical to single-device execution and that the string engine's
aggregate reductions compile and run under a mesh.
"""

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from fhestring_tpu import PARAM_TEST_ZERO_NOISE, parallel, torus
from fhestring_tpu import numpy_ref as ref
from fhestring_tpu.client import ClientKey
from fhestring_tpu.crypto import keys as dkeys
from fhestring_tpu.crypto import pbs as dpbs


@pytest.fixture(scope="module")
def ctx():
    p = PARAM_TEST_ZERO_NOISE
    rng = np.random.default_rng(7)
    sk, srv = ref.keygen(p, rng)
    return p, rng, sk, dkeys.pack_server_keys(srv)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_pbs_matches_unsharded(ctx):
    p, rng, sk, dev = ctx
    table = [(5 * m + 2) % 16 for m in range(16)]
    bank = dkeys.pack_luts([table], p)
    B = 16
    msgs = rng.integers(0, 16, size=B)
    cts = np.stack([ref.shortint_encrypt(sk, int(m), rng) for m in msgs])
    dct = torus.from_numpy(cts)
    idx = np.zeros(B, np.int32)

    want = torus.to_numpy(dpbs.pbs_batch(dct, idx, bank, dev))

    mesh = parallel.make_mesh(8)
    got = torus.to_numpy(
        parallel.pbs_batch_sharded(dct, idx, bank, dev, mesh))
    np.testing.assert_array_equal(got, want)
    for i in range(B):
        assert ref.shortint_decrypt(sk, want[i]) == table[msgs[i]]


def test_lane_sharded_contains_matches(ctx):
    """Character lanes sharded over the mesh; jitted contains under GSPMD
    must agree with the unsharded result (aggregate bit via collectives)."""
    ck = ClientKey(PARAM_TEST_ZERO_NOISE, seed=9)
    srv = ck.get_server_key()
    text = "sixteen chars ab"  # 16 chars: divisible by 8 lanes
    s = ck.encrypt(text, padding=8)
    pat = ck.encrypt_no_padding("chars")

    plain = ck.decrypt_char(srv.contains(s, pat))
    assert plain == 1

    mesh = parallel.make_mesh(8)
    lane = NamedSharding(mesh, P(parallel.BATCH_AXIS))
    repl = NamedSharding(mesh, P())
    s_sh = jax.tree.map(lambda x: jax.device_put(x, lane), s.blocks)
    p_sh = jax.tree.map(lambda x: jax.device_put(x, repl), pat.blocks)

    with mesh:
        bit = srv.engine.contains(s_sh, p_sh)
    from fhestring_tpu.shortint import Blocks

    got = int(ck.decrypt_bits(Blocks(bit.ct, 1, 1.0)))
    assert got == 1


def test_keysharded_pbs_matches_unsharded(ctx):
    """BSK sharded over the GLWE output axis + KSK row-sharded (tensor
    parallelism over the key axes): bit-identical to pbs_batch."""
    p, rng, sk, dev = ctx
    table = [(3 * m + 1) % 16 for m in range(16)]
    bank = dkeys.pack_luts([table], p)
    B = 8
    msgs = rng.integers(0, 16, size=B)
    cts = np.stack([ref.shortint_encrypt(sk, int(m), rng) for m in msgs])
    dct = torus.from_numpy(cts)
    idx = np.zeros(B, np.int32)

    want = torus.to_numpy(dpbs.pbs_batch(dct, idx, bank, dev))

    mesh = parallel.make_key_mesh(2)  # k+1 == 2 output polys
    got = torus.to_numpy(
        parallel.pbs_batch_keysharded(dct, idx, bank, dev, mesh))
    np.testing.assert_array_equal(got, want)
    for i in range(B):
        assert ref.shortint_decrypt(sk, want[i]) == table[msgs[i]]


def test_ntt_fwd_poly_sharded_bit_identical():
    """Butterfly-stage all-to-all NTT (SURVEY 2.4 item 3): the polynomial
    axis sharded over the mesh, stage-1 local / all_to_all / stage-2 local,
    bit-identical to the single-device negacyclic transform."""
    import jax
    import numpy as np

    from fhestring_tpu import parallel
    from fhestring_tpu.crypto import ntt2

    n_dev = min(8, len(jax.devices()))
    mesh = parallel.make_poly_mesh(n_dev)
    N, prime = 2048, ntt2.PRIMES3[1]  # 40961
    assert (N // 128) % n_dev == 0

    rng = np.random.default_rng(0)
    x = rng.integers(-127, 128, size=(3, N)).astype(np.int32)

    plan = ntt2.make_neg_plan(prime, N)
    want = ntt2.neg_fwd(x.astype(np.int64), plan)

    got = np.asarray(parallel.ntt_fwd_poly_sharded(x, N, prime, mesh))
    np.testing.assert_array_equal(got, want.astype(np.int32))


def test_ntt_inv_poly_sharded_bit_identical():
    """Inverse butterfly-stage all-to-all NTT: dense stage local on the k2
    shards (the fwd output layout), all_to_all, block stage local on the
    j1 shards — bit-identical to ntt2.neg_inv, incl. a fwd->inv round trip
    recovering the input polynomials."""
    import jax
    import numpy as np

    from fhestring_tpu import parallel
    from fhestring_tpu.crypto import ntt2

    n_dev = min(8, len(jax.devices()))
    mesh = parallel.make_poly_mesh(n_dev)
    N, prime = 2048, ntt2.PRIMES3[1]  # 40961
    plan = ntt2.make_neg_plan(prime, N)

    rng = np.random.default_rng(1)
    ahat = rng.integers(-(prime // 2), prime // 2 + 1,
                        size=(3, N)).astype(np.int32)
    want = ntt2.neg_inv(ahat.astype(np.int64), plan)
    got = np.asarray(parallel.ntt_inv_poly_sharded(ahat, N, prime, mesh))
    np.testing.assert_array_equal(got, want.astype(np.int32))

    # round trip: inv(fwd(x)) == x * 1 (sigma_0 folds 1/N)
    x = rng.integers(-127, 128, size=(2, N)).astype(np.int32)
    hat = parallel.ntt_fwd_poly_sharded(x, N, prime, mesh)
    back = np.asarray(parallel.ntt_inv_poly_sharded(
        np.asarray(hat), N, prime, mesh))
    np.testing.assert_array_equal(back, x)


def test_ext_group_poly_sharded_bit_identical():
    """The butterfly all-to-all transforms WIRED INTO the external product:
    fwd (all_to_all) -> frequency-local pointwise accumulate over the
    decomposition rows -> inv (all_to_all), bit-identical to the numpy
    composition sum_i neg_inv(center(neg_fwd(d_i) * khat_i))."""
    import jax
    import numpy as np

    from fhestring_tpu import parallel
    from fhestring_tpu.crypto import ntt2

    n_dev = min(8, len(jax.devices()))
    mesh = parallel.make_poly_mesh(n_dev)
    N, prime = 2048, ntt2.PRIMES3[0]  # 12289... (use a supported prime)
    if (prime - 1) % (2 * N) != 0:
        prime = ntt2.PRIMES3[1]
    plan = ntt2.make_neg_plan(prime, N)

    rng = np.random.default_rng(2)
    R, B = 4, 2
    digits = rng.integers(-127, 128, size=(R, B, N)).astype(np.int32)
    key = rng.integers(-127, 128, size=(R, N)).astype(np.int64)
    khat = np.stack([ntt2.neg_fwd(key[i], plan) for i in range(R)])

    def center(v):
        v = np.mod(v, prime)
        return v - np.where(v > prime // 2, prime, 0)

    acc = np.zeros((B, N), np.int64)
    for i in range(R):
        h = ntt2.neg_fwd(digits[i].astype(np.int64), plan)
        acc = center(acc + center(h * khat[i][None]))
    want = ntt2.neg_inv(acc, plan)

    got = np.asarray(parallel.ext_group_poly_sharded(
        digits, np.broadcast_to(khat[:, None], (R, B, N)).astype(np.int32),
        N, prime, mesh))
    np.testing.assert_array_equal(got, want.astype(np.int32))
