"""Bit-exact NumPy reference implementation of the CGGI/TFHE pipeline.

This is the correctness oracle for the JAX/Pallas production path: every
device kernel (blind rotation, sample extraction, keyswitch, LUT evaluation)
is validated against this module on small parameter sets.  It replaces the
role tfhe-rs v0.5.2 plays for the reference crate (see SURVEY.md section 2.3;
reference call sites: src/ciphertext/fheasciichar.rs:36-103).

Everything is plain ``np.uint64`` arithmetic (numpy wraps mod 2**64, which is
exactly torus arithmetic for q = 2**64).  Polynomial products are exact
integer negacyclic convolutions — O(N^2), fine for the small CI parameters.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..params import CryptoParams

U64 = np.uint64

# Torus arithmetic wraps mod 2**64 by design; numpy's overflow warnings for
# scalar uint64 ops are noise here.
np.seterr(over="ignore")


# ---------------------------------------------------------------------------
# Polynomial helpers (negacyclic ring Z_q[X]/(X^N + 1))
# ---------------------------------------------------------------------------

def negacyclic_matrix(poly: np.ndarray) -> np.ndarray:
    """[N, N] matrix M with M[c, t] = sign * poly[(t - c) mod N].

    Row c is ``poly * X^c`` so that ``a @ M`` is the negacyclic product of
    coefficient vector ``a`` with ``poly``.
    """
    n = poly.shape[-1]
    doubled = np.concatenate([poly.astype(U64), U64(0) - poly.astype(U64)])
    idx = (np.arange(n)[None, :] - np.arange(n)[:, None]) % (2 * n)
    return doubled[idx]


def polymul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Exact negacyclic product of two coefficient vectors mod 2**64."""
    a = a.astype(U64)
    mat = negacyclic_matrix(b)
    # uint64 matmul wraps mod 2**64 (C semantics) — exact torus arithmetic.
    return a @ mat


def poly_rotate(poly: np.ndarray, amount: int) -> np.ndarray:
    """Multiply by X^amount in the negacyclic ring (amount mod 2N)."""
    n = poly.shape[-1]
    amount = int(amount) % (2 * n)
    sign_flip = amount >= n
    amount = amount % n
    out = np.roll(poly, amount).astype(U64)
    if amount:
        out[:amount] = U64(0) - out[:amount]
    if sign_flip:
        out = U64(0) - out
    return out


# ---------------------------------------------------------------------------
# Gadget decomposition (tfhe-rs style closest-representable, balanced digits)
# ---------------------------------------------------------------------------

def decompose(values: np.ndarray, base_log: int, levels: int, q_bits: int = 64):
    """Signed balanced decomposition of torus values.

    Returns ``digits`` with shape ``(levels,) + values.shape`` (int64, in
    (-B/2, B/2]), ordered most-significant level first, such that

        sum_l digits[l] * q / B**(l+1)  ≈  values   (error < q / (2 B**levels))
    """
    values = values.astype(U64)
    base = 1 << base_log
    half = base >> 1
    shift = q_bits - base_log * levels
    # Round to the closest multiple of 2**shift (ties away from zero is fine:
    # only shifts noise by < 1 LSB of the gadget).
    if shift > 0:
        state = (values >> U64(shift)) + ((values >> U64(shift - 1)) & U64(1))
    else:
        state = values
    digits = np.zeros((levels,) + values.shape, dtype=np.int64)
    for lev in range(levels - 1, -1, -1):  # least significant level first
        d = (state & U64(base - 1)).astype(np.int64)
        state >>= U64(base_log)
        carry = (d >= half).astype(np.int64)
        d = d - carry * base
        state += carry.astype(U64)
        digits[lev] = d
    return digits


def gadget_factor(level: int, base_log: int, levels: int, q_bits: int = 64) -> int:
    """q / B**(level+1) for level in [0, levels), level 0 most significant."""
    del levels
    return 1 << (q_bits - base_log * (level + 1))


# ---------------------------------------------------------------------------
# Keys
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class SecretKeys:
    params: CryptoParams
    lwe_sk: np.ndarray   # [n] in {0,1}
    glwe_sk: np.ndarray  # [k, N] in {0,1}

    @property
    def big_lwe_sk(self) -> np.ndarray:
        """Flattened GLWE key as an LWE key of dimension k*N."""
        return self.glwe_sk.reshape(-1)


@dataclasses.dataclass
class ServerKeys:
    params: CryptoParams
    # Bootstrap key: GGSW(lwe_sk[j]) under the GLWE key.
    # bsk[j, row, col, :]: row in [0, (k+1)*levels), col in [0, k+1), poly of N.
    bsk: np.ndarray
    # Keyswitch key big->small: ksk[i, lev, :]: LWE_small(big_sk[i] * g_lev),
    # dim n+1.
    ksk: np.ndarray


def keygen(params: CryptoParams, rng: np.random.Generator) -> tuple[SecretKeys, ServerKeys]:
    p = params
    lwe_sk = rng.integers(0, 2, size=p.lwe_dimension, dtype=np.int64)
    glwe_sk = rng.integers(0, 2, size=(p.glwe_dimension, p.polynomial_size), dtype=np.int64)
    sk = SecretKeys(p, lwe_sk, glwe_sk)

    # --- bootstrap key -----------------------------------------------------
    k, N, ell = p.glwe_dimension, p.polynomial_size, p.pbs_level
    bsk = np.zeros((p.lwe_dimension, (k + 1) * ell, k + 1, N), dtype=U64)
    for j in range(p.lwe_dimension):
        bit = int(lwe_sk[j])
        for r in range(k + 1):
            for lev in range(ell):
                row = glwe_encrypt_zero(sk, rng)
                g = U64(gadget_factor(lev, p.pbs_base_log, ell, p.q_bits) % (1 << 64))
                # add m * g to mask poly r (r < k) or to the body (r == k)
                row[r, 0] = row[r, 0] + U64(bit) * g
                bsk[j, r * ell + lev] = row

    # --- keyswitch key (big key -> small key) ------------------------------
    big_sk = sk.big_lwe_sk
    ksk = np.zeros((p.big_lwe_dimension, p.ks_level, p.lwe_dimension + 1), dtype=U64)
    for i in range(p.big_lwe_dimension):
        for lev in range(p.ks_level):
            g = gadget_factor(lev, p.ks_base_log, p.ks_level, p.q_bits)
            pt = U64((int(big_sk[i]) * g) % (1 << 64))
            ksk[i, lev] = lwe_encrypt_raw(lwe_sk, pt, p.lwe_noise_std, rng,
                                          p.torus_bits)

    return sk, ServerKeys(p, bsk, ksk)


def _noise(std_rel: float, shape, rng: np.random.Generator,
           torus_bits: int = 64) -> np.ndarray:
    """Gaussian torus noise, quantized to the effective torus subgroup:
    multiples of 2**(64 - torus_bits) (exact for torus_bits=64)."""
    if std_rel == 0.0:
        return np.zeros(shape, dtype=U64)
    e = np.rint(rng.normal(0.0, std_rel * 2.0**torus_bits, size=shape))
    e = e.astype(np.int64) << (64 - torus_bits)
    return e.astype(U64)


def _uniform(shape, rng: np.random.Generator, torus_bits: int = 64) -> np.ndarray:
    """Uniform torus mask over the effective subgroup (draw count is
    independent of torus_bits: full u64 draws masked down)."""
    a = rng.integers(0, 1 << 64, size=shape, dtype=U64)
    if torus_bits < 64:
        a &= U64(((1 << torus_bits) - 1) << (64 - torus_bits))
    return a


# ---------------------------------------------------------------------------
# LWE
# ---------------------------------------------------------------------------

def lwe_encrypt_raw(sk_bits: np.ndarray, pt: np.uint64, noise_std: float,
                    rng: np.random.Generator,
                    torus_bits: int = 64) -> np.ndarray:
    """Encrypt raw torus plaintext under a binary LWE key. Returns [dim+1].

    pt must lie in the effective torus subgroup (a multiple of
    2**(64 - torus_bits)); mask and noise are sampled inside it, so the
    ciphertext stays subgroup-valued coordinate-wise."""
    assert int(pt) % (1 << (64 - torus_bits)) == 0, (pt, torus_bits)
    dim = sk_bits.shape[0]
    a = _uniform((dim,), rng, torus_bits)
    b = (a * sk_bits.astype(U64)).sum(dtype=U64) + U64(pt) \
        + _noise(noise_std, (), rng, torus_bits)
    return np.concatenate([a, np.atleast_1d(b)])


def lwe_decrypt_raw(sk_bits: np.ndarray, ct: np.ndarray) -> np.uint64:
    """Return the phase b - <a, s> (plaintext + noise)."""
    a, b = ct[:-1], ct[-1]
    return U64(b - (a * sk_bits.astype(U64)).sum(dtype=U64))


def lwe_trivial(dim: int, pt: np.uint64) -> np.ndarray:
    ct = np.zeros(dim + 1, dtype=U64)
    ct[-1] = U64(pt)
    return ct


# ---------------------------------------------------------------------------
# GLWE
# ---------------------------------------------------------------------------

def glwe_encrypt_zero(sk: SecretKeys, rng: np.random.Generator) -> np.ndarray:
    """GLWE encryption of 0. Returns [k+1, N] (masks then body)."""
    p = sk.params
    k, N = p.glwe_dimension, p.polynomial_size
    out = np.zeros((k + 1, N), dtype=U64)
    body = _noise(p.glwe_noise_std, (N,), rng, p.torus_bits)
    for i in range(k):
        a = _uniform((N,), rng, p.torus_bits)
        out[i] = a
        body = body + polymul(a, sk.glwe_sk[i].astype(U64))
    out[k] = body
    return out


def glwe_decrypt(sk: SecretKeys, ct: np.ndarray) -> np.ndarray:
    """Phase polynomial body - sum_i a_i * S_i."""
    p = sk.params
    k = p.glwe_dimension
    phase = ct[k].copy()
    for i in range(k):
        phase = phase - polymul(ct[i], sk.glwe_sk[i].astype(U64))
    return phase


# ---------------------------------------------------------------------------
# External product, CMux, blind rotation, sample extract, keyswitch
# ---------------------------------------------------------------------------

def external_product(bsk_j: np.ndarray, glwe: np.ndarray, p: CryptoParams) -> np.ndarray:
    """GGSW (x) GLWE -> GLWE.  bsk_j: [(k+1)*ell, k+1, N], glwe: [k+1, N]."""
    k, ell = p.glwe_dimension, p.pbs_level
    out = np.zeros_like(glwe)
    for r in range(k + 1):
        digits = decompose(glwe[r], p.pbs_base_log, ell, p.q_bits)  # [ell, N]
        for lev in range(ell):
            d = digits[lev].astype(U64)  # two's complement wraps mod q
            row = bsk_j[r * ell + lev]   # [k+1, N]
            for col in range(k + 1):
                out[col] = out[col] + polymul(d, row[col])
    return out


def cmux(bsk_j: np.ndarray, d0: np.ndarray, d1: np.ndarray, p: CryptoParams) -> np.ndarray:
    return d0 + external_product(bsk_j, (d1 - d0), p)


def cmux_rounded(bsk_j: np.ndarray, acc: np.ndarray, aj: int,
                 p: CryptoParams) -> np.ndarray:
    """CMux with ROUNDED gadget decomposition (ell = 1 only).

    Instead of decomposing diff = acc*X^a - acc exactly, decompose the
    difference of the pre-rounded plane acc_r = round(acc / 2^(64-B))
    (B = pbs_base_log), rotated in Z_{2^B}.  The decomposition
    approximation error grows from 2^(63-B) to <= ~2.5 * 2^(64-B) per
    coefficient (acc rounding + rotation rounding + negation ties) — a
    <= 5x std-dev increase of the decomposition noise term, far inside the
    2_2 parameter budget (~140 sigma of margin at production parameters).
    This halves the data the per-step rotation touches: one B-bit plane
    instead of the u64 accumulator.  Used by the fused TPU kernel
    (crypto/kernels/blind_rotate_fused.py, rounded=True).
    """
    assert p.pbs_level == 1
    blog = p.pbs_base_log
    shift = p.q_bits - blog
    mask = U64((1 << blog) - 1)
    half = 1 << (blog - 1)
    out = acc.copy()
    for r in range(p.glwe_dimension + 1):
        acc_r = ((acc[r] >> U64(shift)) + ((acc[r] >> U64(shift - 1))
                                           & U64(1))) & mask
        # negacyclic rotate in Z_{2^B}
        n = acc_r.shape[-1]
        a = int(aj) % (2 * n)
        flip = a >= n
        a %= n
        rot = np.roll(acc_r, a)
        if a:
            rot[:a] = (U64(0) - rot[:a]) & mask
        if flip:
            rot = (U64(0) - rot) & mask
        state = (rot - acc_r) & mask
        d = state.astype(np.int64) - (state >= half).astype(np.int64) * (1 << blog)
        du = d.astype(U64)  # two's complement wraps mod q
        row = bsk_j[r]      # ell = 1: [k+1, N]
        for col in range(p.glwe_dimension + 1):
            out[col] = out[col] + polymul(du, row[col])
    return out


def _balanced_limbs_i64(v: np.ndarray, num_limbs: int) -> np.ndarray:
    """Signed ints -> balanced base-256 limb planes [num_limbs, ...] (int64),
    v == sum_i limbs[i] * 256**i exactly (same scheme as pbs.balanced_limbs_i32
    and keys.balanced_limbs_u64)."""
    out = np.zeros((num_limbs,) + v.shape, dtype=np.int64)
    state = v.astype(np.int64).copy()
    for i in range(num_limbs):
        l = ((state + 128) & 255) - 128
        out[i] = l
        state = (state - l) >> 8
    return out


def polymul_planes(d: np.ndarray, poly: np.ndarray, num_la: int,
                   min_shift: int = 0) -> np.ndarray:
    """Negacyclic d (x) poly mod 2**64 evaluated over balanced base-256 limb
    planes, TRUNCATING output planes whose base-256 shift is below
    ``min_shift``.

    This is the oracle for the fused TPU kernel's ``approx`` mode: the kernel
    computes sum_{la+lb in [min_shift, 8)} 256^(la+lb) conv(d_la, k_lb); the
    dropped low planes (la+lb < min_shift) carry magnitude <= ~2^(8*min_shift
    + 26) — pure low-order noise, budgeted like tfhe-rs's f64 FFT error.
    min_shift=0 is bit-identical to polymul(d mod 2**64, poly)."""
    n = poly.shape[-1]
    dl = _balanced_limbs_i64(d, num_la)                       # [La, N]
    # key limbs: balanced limbs of u64 with the final carry dropped (mod 2^64
    # exact), as in keys.balanced_limbs_u64
    state = poly.astype(U64).copy()
    kl = np.zeros((8, n), dtype=np.int64)
    for i in range(8):
        dd = (state & U64(0xFF)).astype(np.int64)
        state >>= U64(8)
        carry = (dd >= 128).astype(np.int64)
        kl[i] = dd - carry * 256
        state += carry.astype(U64)
    # negacyclic integer conv per plane pair (exact in int64: |.| <= N*2^14)
    idx = (np.arange(n)[None, :] - np.arange(n)[:, None]) % (2 * n)
    out = np.zeros(n, dtype=U64)
    for lb in range(8):
        doubled = np.concatenate([kl[lb], -kl[lb]])
        mat = doubled[idx]                                    # [N, N] int64
        for la in range(num_la):
            s = la + lb
            if s >= 8 or s < min_shift:
                continue
            conv = dl[la] @ mat                               # exact int64
            out = out + (conv.astype(U64) << U64(8 * s))
    return out


def cmux_fused(bsk_j: np.ndarray, acc: np.ndarray, aj: int, p: CryptoParams,
               rounded: bool = False, min_shift: int = 0) -> np.ndarray:
    """CMux evaluated exactly the way the fused TPU kernels evaluate it:
    optional ROUNDED decomposition (see cmux_rounded; ell = 1 only) and
    optional plane truncation (see polymul_planes).  With rounded=False,
    min_shift=0 this is bit-identical to cmux(bsk_j, acc, rot(acc)).  For
    ell > 1 (the 32-bit turbo set) every gadget level contributes one
    plane-truncated product, matching blind_rotate_fused32's approx mode
    (its dropped kernel plane s'=0 is u64 limb plane s=4, so min_shift=5)."""
    blog, ell = p.pbs_base_log, p.pbs_level
    assert not (rounded and ell != 1)
    num_la = (blog + 8) // 8
    out = acc.copy()
    for r in range(p.glwe_dimension + 1):
        if rounded:
            shift = p.q_bits - blog
            mask = U64((1 << blog) - 1)
            half = 1 << (blog - 1)
            acc_r = ((acc[r] >> U64(shift)) + ((acc[r] >> U64(shift - 1))
                                               & U64(1))) & mask
            n = acc_r.shape[-1]
            a = int(aj) % (2 * n)
            flip = a >= n
            a %= n
            rot = np.roll(acc_r, a)
            if a:
                rot[:a] = (U64(0) - rot[:a]) & mask
            if flip:
                rot = (U64(0) - rot) & mask
            state = (rot - acc_r) & mask
            d = state.astype(np.int64) - (state >= half).astype(np.int64) * (1 << blog)
            digits = d[None]
        else:
            diff = poly_rotate(acc[r], int(aj)) - acc[r]
            digits = decompose(diff, blog, ell, p.q_bits)
        for lev in range(ell):
            row = bsk_j[r * ell + lev]   # [k+1, N]
            for col in range(p.glwe_dimension + 1):
                out[col] = out[col] + polymul_planes(digits[lev], row[col],
                                                     num_la, min_shift)
    return out


def modswitch(ct: np.ndarray, p: CryptoParams) -> np.ndarray:
    """Switch LWE coefficients from q to 2N (rounding)."""
    two_n = 2 * p.polynomial_size
    shift = p.q_bits - (two_n.bit_length() - 1)
    rounded = (ct >> U64(shift)) + ((ct >> U64(shift - 1)) & U64(1))
    return (rounded % U64(two_n)).astype(np.int64)


def blind_rotate(acc: np.ndarray, lwe_2n: np.ndarray, srv: ServerKeys,
                 rounded: bool = False, min_shift: int = 0) -> np.ndarray:
    """Rotate acc by -phase(ct) homomorphically; acc: [k+1, N] GLWE.

    rounded=True uses the rounded gadget decomposition (see cmux_rounded);
    min_shift>0 truncates low external-product limb planes (see
    polymul_planes). Both are plaintext-equivalent approximations with
    slightly larger (budgeted) noise, mirroring the fused TPU kernel's
    rounded/approx modes."""
    p = srv.params
    a, b = lwe_2n[:-1], int(lwe_2n[-1])
    acc = np.stack([poly_rotate(poly, -b) for poly in acc])
    for j in range(p.lwe_dimension):
        if min_shift:
            acc = cmux_fused(srv.bsk[j], acc, int(a[j]), p, rounded=rounded,
                             min_shift=min_shift)
        elif rounded:
            acc = cmux_rounded(srv.bsk[j], acc, int(a[j]), p)
        else:
            rotated = np.stack([poly_rotate(poly, int(a[j])) for poly in acc])
            acc = cmux(srv.bsk[j], acc, rotated, p)
    return acc


def sample_extract(glwe: np.ndarray, p: CryptoParams) -> np.ndarray:
    """Extract coefficient 0 as an LWE ct under the flattened GLWE key."""
    k, N = p.glwe_dimension, p.polynomial_size
    out = np.zeros(k * N + 1, dtype=U64)
    for i in range(k):
        mask = glwe[i]
        ext = np.zeros(N, dtype=U64)
        ext[0] = mask[0]
        ext[1:] = (-mask[:0:-1].astype(np.int64)).astype(U64)
        out[i * N:(i + 1) * N] = ext
    out[-1] = glwe[k][0]
    return out


def keyswitch(ct_big: np.ndarray, srv: ServerKeys) -> np.ndarray:
    """LWE under big key (k*N) -> LWE under small key (n)."""
    p = srv.params
    out = lwe_trivial(p.lwe_dimension, ct_big[-1])
    a = ct_big[:-1]
    digits = decompose(a, p.ks_base_log, p.ks_level, p.q_bits)  # [lev, kN]
    for lev in range(p.ks_level):
        d = digits[lev].astype(U64)
        out = out - (d[:, None] * srv.ksk[:, lev, :]).sum(axis=0, dtype=U64)
    return out


# ---------------------------------------------------------------------------
# Shortint layer: encode/decode + programmable bootstrap
# ---------------------------------------------------------------------------

def encode(value: int, p: CryptoParams) -> np.uint64:
    return U64((int(value) * p.delta) % (1 << 64))


def decode(phase: np.uint64, p: CryptoParams) -> int:
    full = p.full_space
    rounded = (int(phase) + p.delta // 2) // p.delta
    return rounded % full


def make_test_poly(table, p: CryptoParams) -> np.ndarray:
    """Build the accumulator test polynomial for LUT f: [0,16) -> [0,16).

    T[j] encodes f(m) for the slot containing j, with the last half-slot
    wrapped negacyclically (encodes -f(0))."""
    N = p.polynomial_size
    half_slot = N // p.full_space
    slot = 2 * half_slot  # N / plaintext_space
    out = np.zeros(N, dtype=U64)
    for j in range(N):
        m = (j + half_slot) // slot
        if m < p.plaintext_space:
            out[j] = encode(table[m] % p.plaintext_space, p)
        else:  # wrapped: belongs to m=0 approached from below
            out[j] = U64(-int(encode(table[0] % p.plaintext_space, p)) % (1 << 64))
    return out


def pbs(ct_big: np.ndarray, table, srv: ServerKeys) -> np.ndarray:
    """Full KS->PBS pipeline: LWE(big) in, LWE(big) of table[m] out."""
    p = srv.params
    ct_small = keyswitch(ct_big, srv)
    lwe_2n = modswitch(ct_small, p)
    k, N = p.glwe_dimension, p.polynomial_size
    acc = np.zeros((k + 1, N), dtype=U64)
    acc[k] = make_test_poly(table, p)
    acc = blind_rotate(acc, lwe_2n, srv)
    return sample_extract(acc, p)


# ---------------------------------------------------------------------------
# Convenience: shortint encrypt/decrypt under the big key (ciphertext "at
# rest" representation, matching the KS_PBS order of tfhe-rs).
# ---------------------------------------------------------------------------

def shortint_encrypt(sk: SecretKeys, value: int, rng: np.random.Generator) -> np.ndarray:
    p = sk.params
    return lwe_encrypt_raw(sk.big_lwe_sk, encode(value, p), p.glwe_noise_std,
                           rng, p.torus_bits)


# ---------------------------------------------------------------------------
# LWE public key: encryptions of zero; public-key encryption is a random
# binary subset-sum of them plus the trivial plaintext. Functional parity
# with the tfhe-rs PublicKey the reference constructs (and never uses —
# reference src/client_key.rs:32, fheasciichar.rs:22).
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class PublicKey:
    """zeros: [M, dim+1] LWE encryptions of 0 under the big key.

    Security rests on LWE + the leftover hash lemma, which needs
    M >= (dim+1) * log2(q) + ~128 — at production parameters that is the
    same multi-GB object tfhe-rs ships for its PublicKey (the reason the
    reference threads but never uses one). Smaller M (tests) still
    decrypts correctly but does not achieve the LHL bound.
    """

    params: CryptoParams
    zeros: np.ndarray

    @property
    def standard_count(self) -> int:
        return (self.zeros.shape[1]) * self.params.q_bits + 128


def public_keygen(sk: SecretKeys, rng: np.random.Generator,
                  zero_count: int | None = None) -> PublicKey:
    p = sk.params
    dim = sk.big_lwe_sk.shape[0]
    m = zero_count or (dim + 1) * p.q_bits + 128
    zeros = np.stack([
        lwe_encrypt_raw(sk.big_lwe_sk, U64(0), p.glwe_noise_std, rng,
                        p.torus_bits)
        for _ in range(m)])
    return PublicKey(p, zeros)


def public_encrypt(pk: PublicKey, value: int,
                   rng: np.random.Generator) -> np.ndarray:
    """Shortint public-key encryption: random subset-sum of zeros + value."""
    r = rng.integers(0, 2, size=pk.zeros.shape[0], dtype=U64)
    ct = (pk.zeros * r[:, None]).sum(axis=0, dtype=U64)
    ct[-1] = U64(ct[-1] + encode(value, pk.params))
    return ct


def shortint_decrypt(sk: SecretKeys, ct: np.ndarray) -> int:
    p = sk.params
    phase = lwe_decrypt_raw(sk.big_lwe_sk, ct)
    return decode(phase, p) % p.plaintext_space
