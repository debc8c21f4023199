"""Fused rotate+diff+decompose kernel vs the XLA ops (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from fhestring_tpu import torus
from fhestring_tpu.crypto import pbs as dpbs
from fhestring_tpu.crypto.kernels.rotate_decompose import rotate_diff_decompose
from fhestring_tpu.torus import U64


def test_matches_xla_pipeline():
    rng = np.random.default_rng(3)
    B, kp1, N = 8, 2, 256
    base_log, num_la = 23, 3
    acc_np = rng.integers(0, 1 << 64, size=(B, kp1, N), dtype=np.uint64)
    amounts = rng.integers(0, 2 * N, size=B).astype(np.int32)
    acc = torus.from_numpy(acc_np)

    # XLA reference: shear rotate -> sub -> decompose -> limbs
    rotated = dpbs._negacyclic_rotate_shear(acc, jnp.asarray(amounts), N)
    diff = torus.sub(rotated, acc)
    digits = dpbs.decompose(diff, base_log, 1)  # [1, B, kp1, N]
    want = dpbs.balanced_limbs_i32(digits[0].astype(jnp.int32), num_la)
    want = np.asarray(want)  # [B, kp1, N, La]
    want = np.moveaxis(want, -1, 0).reshape(num_la, B, kp1 * N)

    got = np.asarray(rotate_diff_decompose(
        acc.lo, acc.hi, jnp.asarray(amounts), n_poly=N, base_log=base_log,
        num_la=num_la, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_fused_prologue_pbs_matches(monkeypatch):
    """pbs_batch with FUSED_PROLOGUE (kernel A path) stays bit-exact."""
    from fhestring_tpu import PARAM_TEST_NOISY
    from fhestring_tpu import numpy_ref as ref
    from fhestring_tpu.crypto import keys as dkeys

    monkeypatch.setattr(dpbs, "FUSED_PROLOGUE", True)
    rng = np.random.default_rng(5)
    sk, srv = ref.keygen(PARAM_TEST_NOISY, rng)
    dev = dkeys.pack_server_keys(srv)
    table = [(5 * m + 1) % 16 for m in range(16)]
    bank = dkeys.pack_luts([table], PARAM_TEST_NOISY)
    msgs = [0, 6, 11, 15]
    cts = np.stack([ref.shortint_encrypt(sk, m, rng) for m in msgs])
    idx = np.zeros(len(msgs), np.int32)
    got = torus.to_numpy(dpbs.pbs_batch(torus.from_numpy(cts), idx, bank, dev,
                                        use_pallas=True))
    for i, m in enumerate(msgs):
        assert ref.shortint_decrypt(sk, got[i]) == table[m]
