"""Pallas TPU kernel: negacyclic CRT-NTT external product (the v2 hot path).

Replaces the O(N^2) Hankel-matmul convolution (ext_product.py) with the
grouped 3-prime negacyclic NTT of crypto/ntt2.py, evaluated entirely on the
MXU.  Per blind-rotation step this kernel computes, bit-identically to the
matmul path,

    ext[b, jout] = sum_i digits[b, i] (x) BSK_j[i, jout]   (mod 2^64, in
                   Z[X]/(X^N + 1)),

as: forward-NTT the digit limb planes (3 primes), pointwise-multiply with
the precomputed NTT-domain key, inverse-NTT three 256-weighted shift-plane
groups, CRT-reconstruct each group exactly, and recombine to u64.

Dense-billed MXU work is ~66M int8-MACs per item-step at production
parameters vs ~402M for the matmul kernel — a ~6x algorithmic cut
(BASELINE.md speed-of-light analysis).

Layout strategy (every array keeps a 128-wide minor dim; no padded tiles):
batch items are packed nb = 128/n2 at a time into the sublane dim, so the
[j2 <-> j1] relayouts between NTT stages are batched square [128, 128]
transposes (native XLU ops):

    natural  [C, (b8, j2), j1]   C = bt*N/16384 chunks, nb items each
    T1    -> [C, j1, (b8, j2)]
    stage1   blockdiag dot over lanes: nb copies of W2f'[j2, k2]
    twiddle  VPU multiply by T_la[j1, k2] (tiled over b8; 256^la folded)
    T2    -> [C, (b8, k2), j1]  (transpose of the twiddled value)
    stage2   dense dot over lanes j1: W1[j1, k1]
    hat      [C, (b8, k2), k1]  == ntt2.neg_fwd's  h = k2*n1 + k1

and the inverse mirrors it (dense W1i, twiddle Ti with 1/N folded,
blockdiag W2i').  All modular arithmetic is exact: int8-limb MXU dots with
int32 accumulation, static bound tracking, fold-based reduction, and a
final f32-rounding step applied only below 2^21 (where it is provably
exact).  The group scale 256^{-3g} is a per-(prime, g) compile-time scalar.

Reference parity: reference delegates this to tfhe-rs's concrete-fft
negacyclic product (SURVEY.md section 2.3); here it is exact integer
arithmetic, so no transform-noise term exists.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ntt2 import GROUP, NUM_GROUPS, NUM_LB, PRIMES3, M3, make_neg_plan
from ..ntt import _center

LANE = 128
INT32_SAFE = (1 << 31) - 1

# 2^k == c (mod p) with small c: one fold shrinks |v| by ~2^-k * c.
_FOLDS = {12289: (14, 4095), 40961: (17, 8189), 61441: (16, 4095)}


# ---------------------------------------------------------------------------
# Constant packing (host side)
# ---------------------------------------------------------------------------

def _limbs8(m: np.ndarray):
    """Centered ints |v| <= 2^15 -> two balanced int8 limb matrices."""
    m = np.asarray(m, np.int64)
    l0 = ((m + 128) % 256) - 128
    l1 = (m - l0) // 256
    assert np.abs(l1).max() <= 127
    return np.stack([l0, l1]).astype(np.int8)


def pack_neg_consts(n: int, num_la: int = 3):
    """Device constants for the kernel: one dict of jnp arrays.

    Shapes (P = 3 primes, n1 = 128, n2 = n/128, nb = 128/n2):
      wblkf [P, 2, 128, 128] int8   fwd blockdiag: nb copies of
                                    W2f'[j2, k2] = psi^{n1 j2} w^{n1 j2 k2}
      tf    [P, La, 128, 128] int32 fwd twiddle tiled over b8:
                                    psi^{j1} w^{j1 k2} 256^{la}
      w1f   [P, 2, 128, 128] int8   dense W1[j1, k1] = w^{n2 j1 k1}
      w1i   [P, 2, 128, 128] int8   dense W1i[k1, j1] = w^{-n2 j1 k1}
      ti    [P, 128, 128] int32     inv twiddle tiled:
                                    psi^{-j1} w^{-j1 k2} / N
      wblki [P, 2, 128, 128] int8   inv blockdiag: nb copies of
                                    W2i'[k2, j2] = psi^{-n1 j2} w^{-n1 j2 k2}
    """
    n1 = LANE
    assert n % n1 == 0 and n >= n1, n
    n2 = n // n1
    assert LANE % n2 == 0, (n, n2)
    nb = LANE // n2

    from ..ntt import omega_root

    wblkf, tf, w1f, w1i, ti, wblki = [], [], [], [], [], []
    for p in PRIMES3:
        psi = omega_root(p, 2 * n)
        w = psi * psi % p
        wi = pow(w, p - 2, p)
        psii = pow(psi, p - 2, p)
        n_inv = pow(n, p - 2, p)

        j1 = np.arange(n1)
        j2 = np.arange(n2)
        k1 = np.arange(n1)
        k2 = np.arange(n2)

        def pw(base, e, p=p):
            e = np.mod(e, 2 * n)
            flat = np.array([pow(base, int(x), p) for x in e.ravel()],
                            dtype=np.int64)
            return flat.reshape(e.shape)

        def blkdiag(block):
            out = np.zeros((LANE, LANE), np.int64)
            for b in range(nb):
                out[b * n2:(b + 1) * n2, b * n2:(b + 1) * n2] = block
            return out

        w2f = _center(pw(psi, n1 * j2[:, None] + 0 * k2[None, :])
                      * pw(w, n1 * j2[:, None] * k2[None, :]) % p, p)
        wblkf.append(_limbs8(blkdiag(w2f)))

        t_base = pw(psi, j1[:, None] + 0 * k2[None, :]) \
            * pw(w, j1[:, None] * k2[None, :]) % p
        tfl = []
        for la in range(num_la):
            t_la = _center(t_base * pow(256, la, p) % p, p)   # [n1, n2]
            tfl.append(np.tile(t_la, (1, nb)))                # [n1, 128]
        tf.append(np.stack(tfl).astype(np.int32))

        w1f.append(_limbs8(_center(pw(w, n2 * j1[:, None] * k1[None, :]), p)))
        w1i.append(_limbs8(_center(pw(wi, n2 * j1[None, :] * k1[:, None]), p)))

        ti_base = pw(psii, j1[:, None] + 0 * k2[None, :]) \
            * pw(wi, j1[:, None] * k2[None, :]) % p * n_inv % p
        ti.append(np.tile(_center(ti_base, p), (1, nb)).astype(np.int32))

        w2i = _center(pw(psii, n1 * j2[None, :] + 0 * k2[:, None])
                      * pw(wi, n1 * j2[None, :] * k2[:, None]) % p, p)
        wblki.append(_limbs8(blkdiag(w2i)))

    as_j = lambda x: jnp.asarray(np.stack(x))
    return {"wblkf": as_j(wblkf), "tf": as_j(tf), "w1f": as_j(w1f),
            "w1i": as_j(w1i), "ti": as_j(ti), "wblki": as_j(wblki)}


# ---------------------------------------------------------------------------
# In-kernel exact modular helpers (static bound tracking)
# ---------------------------------------------------------------------------

def _modc_f(v, bound: int, p: int):
    """One-multiply approximate Barrett reduction: v' == v (mod p) with
    |v'| <= ~0.51*p, computed as v - round(fl(v)*fl(1/p))*p in exact int32.

    The f32 quotient may be off by eps <= (bound/p)*2^-22 + 2^-22; that only
    widens the output bound (p*(0.5+eps)), never breaks the residue.
    Returns (v', new_bound)."""
    assert bound <= INT32_SAFE - 3 * p, bound
    q = jnp.round(v.astype(jnp.float32) * np.float32(1.0 / p)).astype(jnp.int32)
    out = v - q * np.int32(p)
    qerr = (bound / p) * 2.0 ** -22 + 2.0 ** -22
    return out, int(p * (0.5 + qerr)) + 2


def _modc(v, bound: int, p: int):
    """Exact centered reduction mod p: |out| <= (p-1)/2."""
    v, nb = _modc_f(v, bound, p)
    if nb > (p - 1) // 2:
        half = np.int32((p - 1) // 2)
        v = v - jnp.where(v > half, np.int32(p), 0)
        v = v + jnp.where(v < -half, np.int32(p), 0)
    return v


def _split2(v):
    """Centered |v| <= 2^15 -> two balanced int8 limbs."""
    l0 = ((v + 128) & 255) - 128
    l1 = (v - l0) >> 8
    return l0.astype(jnp.int8), l1.astype(jnp.int8)


def _dot8(a8, w8):
    return jax.lax.dot(a8, w8, preferred_element_type=jnp.int32)


def _horner4(p00, p01, p10, p11, p: int, exact: bool):
    """Recombine 4 limb-pair dot planes (each |.| <= 2^21), mod p."""
    t, tb = _modc_f(p01 + p10 + (p11 << 8), (1 << 22) + (1 << 29), p)
    v = p00 + (t << 8)
    b = (1 << 21) + 256 * tb
    if exact:
        return _modc(v, b, p), (p - 1) // 2
    return _modc_f(v, b, p)


def _stage_dots(z32, wl, p: int, exact: bool = False):
    """Near-centered int32 [M, 128] (|.| <= ~0.51p, split2-safe) x int16-limb
    weights -> int32 [M, 128] (centered if exact, else ~0.51p)."""
    z0, z1 = _split2(z32)
    return _horner4(_dot8(z0, wl[0]), _dot8(z0, wl[1]),
                    _dot8(z1, wl[0]), _dot8(z1, wl[1]), p, exact)


class _Acc:
    """Bound-tracked int32 accumulator with automatic folding."""

    def __init__(self, p: int):
        self.p, self.v, self.bound = p, None, 0

    def add(self, term, term_bound: int):
        if self.v is None:
            self.v, self.bound = term, term_bound
            return
        if self.bound + term_bound > INT32_SAFE - 3 * self.p:
            self.v, self.bound = _modc_f(self.v, self.bound, self.p)
        self.v = self.v + term
        self.bound += term_bound

    def fast(self):
        return _modc_f(self.v, self.bound, self.p)


# ---------------------------------------------------------------------------
# u64 limb arithmetic (uint32 pairs)
# ---------------------------------------------------------------------------

def _add64(alo, ahi, blo, bhi):
    lo = alo + blo
    return lo, ahi + bhi + (lo < blo).astype(jnp.uint32)


def _shl64(lo, hi, s: int):
    if s == 0:
        return lo, hi
    if s < 32:
        return lo << s, (hi << s) | (lo >> (32 - s))
    return jnp.zeros_like(lo), lo << (s - 32)


def crt3_u64(v1, v2, v3):
    """Exact 3-prime CRT to u64 limbs: centered int32 residues ->
    (lo, hi) uint32 of the centered integer mod 2^64."""
    P1, P2, P3 = PRIMES3
    INV_P1_P2 = pow(P1, P2 - 2, P2)
    INV_P12_P3 = pow(P1 * P2 % P3, P3 - 2, P3)
    C_LO, C_HI = (P1 * P2) & 0xFFFF, (P1 * P2) >> 16
    T_PLUS1 = (M3 + 1) // 2
    TH, TL = T_PLUS1 >> 32, T_PLUS1 & 0xFFFFFFFF
    M3H, M3L = M3 >> 32, M3 & 0xFFFFFFFF

    x1 = v1 + jnp.where(v1 < 0, np.int32(P1), 0)
    t2 = v2 - x1
    t2 = t2 + jnp.where(t2 < 0, np.int32(P2), 0)
    x2 = _modc(t2 * np.int32(INV_P1_P2), (P2 - 1) * INV_P1_P2, P2)
    x2 = x2 + jnp.where(x2 < 0, np.int32(P2), 0)
    r12 = x1 + np.int32(P1) * x2                   # < P1*P2 < 2^29
    m12 = _modc(r12, P1 * P2, P3)
    m12 = m12 + jnp.where(m12 < 0, np.int32(P3), 0)
    t3 = v3 - m12                     # in (-1.5*P3, P3/2]
    t3 = t3 + jnp.where(t3 < 0, np.int32(P3), 0)
    t3 = t3 + jnp.where(t3 < 0, np.int32(P3), 0)
    pr = t3.astype(jnp.uint32) * jnp.uint32(INV_P12_P3)  # < 2^31.9
    v = ((pr >> 16).astype(jnp.int32) * 4095
         + (pr & 65535).astype(jnp.int32))
    x3 = _modc(v, ((P3 - 1) * INV_P12_P3 >> 16) * 4095 + 65535, P3)
    x3 = x3 + jnp.where(x3 < 0, np.int32(P3), 0)
    # U = r12 + (P1*P2) * x3 as u64 limbs
    lo = r12.astype(jnp.uint32)
    hi = jnp.zeros_like(lo)
    x3u = x3.astype(jnp.uint32)
    lo, hi = _add64(lo, hi, x3u * np.uint32(C_LO), hi * 0)
    b1 = x3u * np.uint32(C_HI)                     # < 2^29
    lo, hi = _add64(lo, hi, (b1 & 0xFFFF) << 16, b1 >> 16)
    # center: U > (M3-1)/2  <=>  U >= T_PLUS1
    over = (hi > np.uint32(TH)) | ((hi == np.uint32(TH))
                                   & (lo >= np.uint32(TL)))
    slo = lo - np.uint32(M3L)
    borrow = (lo < np.uint32(M3L)).astype(jnp.uint32)
    shi = hi - np.uint32(M3H) - borrow
    lo = jnp.where(over, slo, lo)
    hi = jnp.where(over, shi, hi)
    return lo, hi


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _ntt_ext_kernel(dl_ref, khat_ref, wblkf_ref, tf_ref, w1f_ref, w1i_ref,
                    ti_ref, wblki_ref, lo_ref, hi_ref, dhat_ref, res_ref, *,
                    n: int, bt: int, num_la: int, num_r: int, kp1: int,
                    ablate: str = ""):
    n1, n2 = LANE, n // LANE
    nb = LANE // n2
    C = bt * n // (LANE * LANE)
    P = len(PRIMES3)
    HALF = [p // 2 for p in PRIMES3]

    # ---- T1: transpose digit limbs once (prime-independent) --------------
    # dl [La, bt, R*N] -> xT8 [La*R*C, j1, (b8, j2)] int8
    xts = []
    for la in range(num_la):
        for i in range(num_r):
            x = dl_ref[la, :, i * n:(i + 1) * n]          # [bt, N] int8
            x3 = x.reshape(C, LANE, LANE).astype(jnp.int32)
            xts.append(jnp.swapaxes(x3, 1, 2).astype(jnp.int8))
    xT8 = jnp.concatenate(xts, axis=0)                    # [La*R*C, 128, 128]
    A = xT8.reshape(num_la * num_r * C * LANE, LANE)

    # pointwise pair lists per group
    pairs = [[(la, lb) for la in range(num_la) for lb in range(NUM_LB)
              if la + lb < NUM_LB and (la + lb) // GROUP == g]
             for g in range(NUM_GROUPS)]

    for pi, p in enumerate(PRIMES3):
        # ---- forward: stage 1 (blockdiag) + twiddle + T2 + stage 2 -------
        if "fwd" in ablate:
            dhat_ref[...] = A.astype(jnp.int32).reshape(
                num_la, num_r, C, LANE, LANE)
        else:
            s_raw = (_dot8(A, wblkf_ref[pi, 0]).astype(jnp.int32)
                     + (_dot8(A, wblkf_ref[pi, 1]) << 8))
            s, sb = _modc_f(s_raw, (1 << 21) + (1 << 29), p)
            s = s.reshape(num_la, num_r * C, LANE, LANE)   # rows j1
            dhat_planes = []
            db = 0
            for la in range(num_la):
                z = s[la] * tf_ref[pi, la][None]
                z, _ = _modc_f(z, sb * ((p - 1) // 2), p)  # split2-safe
                zt = jnp.swapaxes(z, 1, 2)                 # [(b8,k2), j1]
                d, db = _stage_dots(zt.reshape(num_r * C * LANE, LANE),
                                    w1f_ref[pi], p)
                dhat_planes.append(d.reshape(num_r, C, LANE, LANE))
            dhat_ref[...] = jnp.stack(dhat_planes)         # [La, R, C, .., ..]

        # ---- pointwise + group scale ------------------------------------
        if "pw" in ablate:
            uall = jnp.broadcast_to(
                dhat_ref[0, 0][None], (kp1 * NUM_GROUPS, C, LANE, LANE))
        else:
            uhats = []
            if "fwd" in ablate:
                db = 128  # ablation fills dhat with raw int8 casts
            pb = db * ((p - 1) // 2)
            for jout in range(kp1):
                for g in range(NUM_GROUPS):
                    acc = _Acc(p)
                    for (la, lb) in pairs[g]:
                        for i in range(num_r):
                            kh = khat_ref[pi, i, jout, lb].astype(jnp.int32)
                            kt = jnp.broadcast_to(kh[None], (nb, n2, n1))
                            kt = kt.reshape(LANE, LANE)
                            acc.add(dhat_ref[la, i] * kt[None], pb)
                    u, ub = acc.fast()
                    if g:
                        sc = _center(
                            np.array(pow(pow(256, 3 * g, p), p - 2, p)), p)
                        u, ub = _modc_f(u * np.int32(sc),
                                        ub * ((p - 1) // 2), p)
                    uhats.append(u)                        # [C, (b8,k2), k1]
            uall = jnp.stack(uhats)                        # [kp1*G, C, .., ..]

        # ---- inverse: dense + twiddle + T3 + blockdiag --------------------
        if "inv" in ablate:
            res_ref[pi] = uall.reshape(kp1, NUM_GROUPS, C, LANE, LANE)
        else:
            q, qb = _stage_dots(
                uall.reshape(kp1 * NUM_GROUPS * C * LANE, LANE),
                w1i_ref[pi], p)
            q = q.reshape(kp1 * NUM_GROUPS * C, LANE, LANE)  # rows (b8,k2)
            qt = jnp.swapaxes(q, 1, 2)                     # rows j1
            r, _ = _modc_f(qt * ti_ref[pi][None], qb * ((p - 1) // 2), p)
            res, _ = _stage_dots(
                r.reshape(kp1 * NUM_GROUPS * C * LANE, LANE),
                wblki_ref[pi], p, exact=True)
            res_ref[pi] = res.reshape(kp1, NUM_GROUPS, C, LANE, LANE)

    # ---- CRT + u64 recombine + output transpose ---------------------------
    for jout in range(kp1):
        if "crt" in ablate:
            v = res_ref[0, jout, 0].astype(jnp.uint32)
            for out_ref in (lo_ref, hi_ref):
                out_ref[:, jout * n:(jout + 1) * n] = (
                    jnp.swapaxes(v, 1, 2).reshape(bt, n))
            continue
        elo = ehi = None
        for g in range(NUM_GROUPS):
            lo, hi = crt3_u64(res_ref[0, jout, g], res_ref[1, jout, g],
                              res_ref[2, jout, g])
            lo, hi = _shl64(lo, hi, 24 * g)
            if elo is None:
                elo, ehi = lo, hi
            else:
                elo, ehi = _add64(elo, ehi, lo, hi)
        # packed [C, j1, (b8, j2)] -> natural [bt, N]
        for out_ref, val in ((lo_ref, elo), (hi_ref, ehi)):
            nat = jnp.swapaxes(val, 1, 2).reshape(bt, n)
            out_ref[:, jout * n:(jout + 1) * n] = nat


@functools.partial(jax.jit, static_argnames=("n_poly", "b_tile", "interpret",
                                              "ablate"))
def ntt_ext_u64(dl: jnp.ndarray, khat_j: jnp.ndarray, consts: dict, *,
                n_poly: int, b_tile: int = 128, interpret: bool = False,
                ablate: str = ""):
    """Pallas entry.

    dl: int8 [La, B, R*N] digit limbs, natural coefficient order;
    khat_j: int16 [3, R, kp1, 8, n2, n1] NTT-domain key for this step
            (from keys.pack_bsk_ntt2, 256^lb folded in);
    consts: from pack_neg_consts(n_poly).

    Returns (lo, hi) uint32 [B, kp1, N]: the external-product GLWE delta
    mod 2^64, bit-identical to kernels/ext_product.ext_product_u64.
    """
    num_la, B, kn = dl.shape
    _, num_r, kp1, _, n2, n1 = khat_j.shape
    n = n1 * n2
    assert kn == num_r * n and n == n_poly
    assert n1 == LANE and LANE % n2 == 0
    bt = min(b_tile, B)
    nb = LANE // n2
    while B % bt or bt % nb:
        bt //= 2
    assert bt >= nb, (B, b_tile, nb)
    C = bt * n // (LANE * LANE)
    grid = (B // bt,)

    kh6 = khat_j
    lo, hi = pl.pallas_call(
        functools.partial(_ntt_ext_kernel, n=n, bt=bt, num_la=num_la,
                          num_r=num_r, kp1=kp1, ablate=ablate),
        grid=grid,
        in_specs=[
            pl.BlockSpec((num_la, bt, kn), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(kh6.shape, lambda i: (0,) * 6,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(consts["wblkf"].shape, lambda i: (0,) * 4,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(consts["tf"].shape, lambda i: (0,) * 4,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(consts["w1f"].shape, lambda i: (0,) * 4,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(consts["w1i"].shape, lambda i: (0,) * 4,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(consts["ti"].shape, lambda i: (0,) * 3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(consts["wblki"].shape, lambda i: (0,) * 4,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, kp1 * n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, kp1 * n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, kp1 * n), jnp.uint32),
            jax.ShapeDtypeStruct((B, kp1 * n), jnp.uint32),
        ],
        scratch_shapes=[
            pltpu.VMEM((num_la, num_r, C, LANE, LANE), jnp.int32),   # dhat
            pltpu.VMEM((3, kp1, NUM_GROUPS, C, LANE, LANE), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(dl, kh6, consts["wblkf"], consts["tf"], consts["w1f"], consts["w1i"],
      consts["ti"], consts["wblki"])
    return lo.reshape(B, kp1, n), hi.reshape(B, kp1, n)
