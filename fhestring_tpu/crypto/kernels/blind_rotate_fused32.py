"""Pallas TPU kernel: fused blind rotation for the 32-bit torus (turbo mode).

The 64-bit fused kernel (blind_rotate_fused.py) carries a u64 accumulator on
two uint32 planes, 3-limb digits, 8 key limb planes and a 3-prime grouped
CRT.  On the reduced-precision torus (params.torus_bits=32, e.g.
PARAM_MESSAGE_2_CARRY_2_KS_PBS_32: gadget base 2^8, 3 levels) every torus
value is a multiple of 2^32, and the same blind rotation collapses:

- the accumulator is ONE uint32 plane (the u64 hi limb; lo == 0 invariant),
  so the per-step negacyclic shear rotation is EXACT at the cost the 64-bit
  kernel pays for its *approximate* "rounded" mode;
- gadget digits satisfy |d| <= 128: a digit IS its single balanced int8
  limb — the digit-limb split disappears (num_la == 1);
- keys quantized to the subgroup have exactly 4 nonzero byte-limb planes,
  so the external product has 4 output shift planes s = lb in {0..3}
  (256^4 == 0 mod 2^32) instead of 21 live (la, lb) pairs;
- each plane's exact integer value is bounded by R*N*128^2 ~ 2*10^8
  < M/2 (M = 40961 * 61441 ~ 2.5*10^9), so TWO 16-bit NTT primes
  reconstruct it exactly in int32 — no 256-weighted plane grouping, no
  3-prime CRT, and no u64 limb emulation anywhere: the final recombination
  is sum_s W_s << 8s in plain uint32 arithmetic.

The NTT itself is the proven twiddle-folded four-step negacyclic transform
of blind_rotate_fused.py / ntt_ext.py (same stage matrices, same
approximate-Barrett reduction with static bound tracking), restricted to
two primes and a single digit limb.

Exactness contract: bit-identical to numpy_ref.blind_rotate (exact path,
ell = 3) on the hi plane; approx=True drops output plane s = 0 (u64 limb
plane 4), oracle numpy_ref.blind_rotate(min_shift=5) — a budgeted
low-order noise term mirroring tfhe-rs's f64 FFT error (the reference
delegates this product to concrete-fft; SURVEY.md section 2.3, reference
call sites src/ciphertext/fheasciichar.rs:36-103).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ntt import _center, omega_root
from .ntt_ext import (LANE, _Acc, _dot8, _modc, _modc_f, _split2,
                      _stage_dots, _limbs8, _FOLDS)

# Two NTT primes == 1 (mod 4096): negacyclic N for all N <= 2048.
PRIMES2 = (40961, 61441)
M2 = PRIMES2[0] * PRIMES2[1]
NUM_LB32 = 4  # key byte-limb planes of a 32-bit torus value
_INV_P1_P2 = pow(PRIMES2[0], PRIMES2[1] - 2, PRIMES2[1])


def max_plane_value(num_r: int, n: int) -> int:
    """Worst-case |W_s| per output shift plane (single digit limb)."""
    return num_r * n * 128 * 128


def pack_fused32_consts(n: int):
    """Twiddle-folded stage constants over PRIMES2 (single digit limb).

    Shapes (P = 2 primes, n2 = n/128, nb = 128/n2):
      wblkf [P, 2, 128, 128] int8  stage-1 blockdiag, in-col (b8, j2) ->
            out-col (k2, b8); entry psi^{n1 j2} w^{n1 j2 k2}
      w1f   [P, n2, 2, 128, 128] int8  per-k2 dense [j1, k1]:
            w^{n2 j1 k1} * psi^{j1} w^{j1 k2}
      w1i   [P, n2, 2, 128, 128] int8  per-k2 dense [k1, j1]:
            w^{-n2 j1 k1} * psi^{-j1} w^{-j1 k2} / N
      wblki [P, 2, 128, 128] int8  inv blockdiag, in-col (k2, b8) ->
            out-col (b8, j2); entry psi^{-n1 j2} w^{-n1 j2 k2}
    """
    n1 = LANE
    assert n % n1 == 0 and n >= n1
    n2 = n // n1
    nb = LANE // n2

    wblkf, w1f, w1i, wblki = [], [], [], []
    for p in PRIMES2:
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

        w2f = pw(psi, n1 * j2[:, None] + 0 * k2[None, :]) \
            * pw(w, n1 * j2[:, None] * k2[None, :]) % p        # [j2, k2]
        blk = np.zeros((LANE, LANE), np.int64)
        for b in range(nb):
            # in-col j2*nb + b8 (the PACKED accumulator's lane order)
            # -> out-col k2*nb + b8
            blk[b::nb, b::nb] = w2f
        wblkf.append(_limbs8(_center(blk, p)))

        tw_f = pw(psi, j1[:, None] + 0 * k2[None, :]) \
            * pw(w, j1[:, None] * k2[None, :]) % p             # [j1, k2]
        base_w1 = pw(w, n2 * j1[:, None] * k1[None, :])        # [j1, k1]
        w1f.append(np.stack([
            _limbs8(_center(base_w1 * tw_f[:, kk:kk + 1] % p, p))
            for kk in range(n2)]))

        tw_i = pw(psii, j1[:, None] + 0 * k2[None, :]) \
            * pw(wi, j1[:, None] * k2[None, :]) % p * n_inv % p
        base_w1i = pw(wi, n2 * j1[None, :] * k1[:, None])      # [k1, j1]
        w1i.append(np.stack([
            _limbs8(_center(base_w1i * tw_i[:, kk].reshape(1, n1) % p, p))
            for kk in range(n2)]))

        w2i = pw(psii, n1 * j2[None, :] + 0 * k2[:, None]) \
            * pw(wi, n1 * j2[None, :] * k2[:, None]) % p       # [k2, j2]
        blk = np.zeros((LANE, LANE), np.int64)
        for b in range(nb):
            # in-col k2*nb + b8  ->  out-col j2*nb + b8 (packed acc order:
            # the inverse transform lands DIRECTLY in accumulator layout)
            blk[b::nb, b::nb] = w2i
        wblki.append(_limbs8(_center(blk, p)))

    as_j = lambda x: jnp.asarray(np.stack(x))
    return {"wblkf": as_j(wblkf), "w1f": as_j(w1f), "w1i": as_j(w1i),
            "wblki": as_j(wblki)}


# Bound fed to _modc_f for the Garner quotient t * INV_c in crt_accum:
# |t| = |v2 - v1| <= 0.51*(P1 + P2) <= 52226 and |INV_c| <= P2/2 < 30720,
# so |t*INV_c| <= 1.605e9 < 2^31 - 3*P2 (int32-safe).  Valid ONLY for the
# non-ablated inverse output: _stage_dots(exact=False) returns |.| <=
# ~0.5001p, but acc.fast() under the "inv" ablation can emit up to ~0.5125p
# — the ablations are non-exact diagnostics and never feed this path.
CRT_T_BOUND = 52226 * 30720


def _fused32_kernel(acc0_ref, amt_ref, khat_ref, wblkf_ref, w1f_ref,
                    w1i_ref, wblki_ref, out_ref, acc_s, *scr,
                    n: int, bt: int, num_r: int, ell: int, kp1: int,
                    n_steps: int, base_log: int, s0: int, halves: bool,
                    kt_wide: bool = False, ablate: str = ""):
    n1, n2 = LANE, n // LANE
    nb = LANE // n2
    C = bt * n // (LANE * LANE)
    NS = NUM_LB32 - s0
    j = pl.program_id(1)
    # scratch refs: one (dhat, work, res) triple per (prime, half) chain
    n_chains = 4 if halves else 2
    dhat_r = scr[0:n_chains]
    work_r = scr[n_chains:2 * n_chains]
    res_r = scr[2 * n_chains:3 * n_chains]

    @pl.when(j == 0)
    def _():
        acc_s[...] = acc0_ref[...]

    # PACKED accumulator layout [kp1, C, j1, (j2, b8)]: coefficient
    # t = j2*n1 + j1 of item b lives at chunk c = b // nb, sublane j1,
    # lane j2*nb + (b % nb).  This is exactly the NTT pipeline's row/lane
    # layout, so the digit rows feed stage 1 with NO T1 transpose and the
    # inverse blockdiag (out-cols re-permuted at pack time) lands straight
    # back in accumulator layout — the per-step relayouts of the natural-
    # order design (6 int8 + 2 u32 [C,128,128] transposes) disappear.  The
    # negacyclic rotation decomposes as sublane rolls (t mod n1) + lane
    # rolls by multiples of nb (the j2 digit), each with a carry/sign fix.
    # Minor dims fill whole (8, 128) int32 tiles (full VPU occupancy).
    bits = (2 * n).bit_length() - 1

    def front(cs, nc):
        """Shear + decompose chunk-slice cs (nc chunks) -> int8 digit rows."""
        hi = acc_s[:, cs]                          # [kp1, nc, n1, LANE] u32
        amt3 = amt_ref[0, cs].reshape(1, nc, 1, LANE).astype(jnp.int32)
        row_i = jax.lax.broadcasted_iota(jnp.int32, hi.shape, 2)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, hi.shape, 3)

        # ---- EXACT negacyclic rotation of the single u32 plane ------------
        if "shear" in ablate:
            diff = hi + amt3.astype(jnp.uint32)    # ablation: skip rotation
        else:
            r = hi
            for k in range(bits):
                s = 1 << k
                if s >= n:
                    nr = jnp.zeros_like(r) - r     # rotation by N == negation
                elif s < n1:
                    # j1 += s (sublane roll); wrapped rows carry into j2 (+nb
                    # lane roll); rows that wrapped past N (j2 -> 0) negate.
                    nr = pltpu.roll(r, s, 2)
                    carried = row_i < s
                    nr = jnp.where(carried, pltpu.roll(nr, nb, 3), nr)
                    sign = carried & (lane_i < nb)
                    nr = jnp.where(sign, jnp.zeros_like(nr) - nr, nr)
                else:
                    # j2 += s/n1: lane roll by nb*(s/n1); wrapped lanes negate
                    sh = nb * (s // n1)
                    nr = pltpu.roll(r, sh, 3)
                    nr = jnp.where(lane_i < sh, jnp.zeros_like(nr) - nr, nr)
                take = ((amt3 >> k) & 1) == 1
                r = jnp.where(take, nr, r)
            diff = r - hi                          # u32 (wraps mod 2^32)

        # ---- closest-representable rounding + balanced base-256 digits ----
        # Identical to numpy_ref.decompose on diff << 32 (q_bits=64): the u64
        # shift 64 - base_log*ell lands entirely inside this u32 plane.
        sh32 = 32 - base_log * ell
        assert sh32 > 0 and base_log == 8
        state = (diff >> jnp.uint32(sh32)) + ((diff >> jnp.uint32(sh32 - 1))
                                              & jnp.uint32(1))
        digs = [None] * ell
        for lev in range(ell - 1, -1, -1):         # least-significant first
            d = (state & jnp.uint32(255)).astype(jnp.int32)
            state = state >> jnp.uint32(8)
            carry = (d >= 128).astype(jnp.int32)
            d = d - (carry << 8)                   # in [-128, 127]
            state = state + carry.astype(jnp.uint32)
            digs[lev] = d

        # rows (r*ell + lev): already in stage-1 layout, just cast
        xts = []
        for rr in range(kp1):
            for lev in range(ell):
                xts.append(digs[lev][rr].astype(jnp.int8))
        return jnp.concatenate(xts, axis=0).reshape(num_r * nc * LANE, LANE)

    # Per-(prime, half) chains with INDEPENDENT scratch REFS (physically
    # distinct buffers, not slices of one ref): no two chains share a Ref
    # until the CRT, so neither the Mosaic scheduler nor the hardware
    # scoreboard sees a false dependency between one chain's scratch stores
    # and another's loads — one chain's MXU transform stages can drain while
    # another's VPU pointwise/CRT work runs.
    def fwd(pi, p, dhat_ref, nc, A):
        db = 0
        if "fwd" in ablate:
            db = 128
            dhat_ref[...] = A.astype(jnp.int32).reshape(num_r, nc, LANE, LANE)
        else:
            s_raw = (_dot8(A, wblkf_ref[pi, 0]).astype(jnp.int32)
                     + (_dot8(A, wblkf_ref[pi, 1]) << 8))
            sv, sb = _modc_f(s_raw, (1 << 21) + (1 << 29), p)
            sv = sv.reshape(num_r * nc, LANE, LANE)  # rows j1, lanes (k2, b8)
            stv = jnp.swapaxes(sv, 1, 2)            # rows (k2, b8), lanes j1
            z0, z1 = _split2(stv)
            for kk in range(n2):
                rows = slice(kk * nb, (kk + 1) * nb)
                a0 = z0[:, rows, :].reshape(num_r * nc * nb, LANE)
                a1 = z1[:, rows, :].reshape(num_r * nc * nb, LANE)
                wl = w1f_ref[pi, kk]
                t, tb = _modc_f(_dot8(a0, wl[1]) + _dot8(a1, wl[0])
                                + (_dot8(a1, wl[1]) << 8),
                                (1 << 22) + (1 << 29), p)
                dv, db = _modc_f(_dot8(a0, wl[0]) + (t << 8),
                                 (1 << 21) + (tb << 8), p)
                dhat_ref[:, :, rows, :] = dv.reshape(num_r, nc, nb, LANE)
        return db

    def pointwise(pi, p, db, dhat_ref, nc):
        if "pw" in ablate:
            return jnp.broadcast_to(
                dhat_ref[0][None], (kp1 * NS, nc, LANE, LANE)
            ).astype(jnp.int32) & 0x7FFF
        uhats = []
        pb = db * ((p - 1) // 2)
        for jout in range(kp1):
            for s_pl in range(s0, NUM_LB32):
                acc = _Acc(p)
                for i in range(num_r):
                    kh = khat_ref[0, pi, i, jout, s_pl].astype(jnp.int32)
                    if kt_wide:
                        kt = kh                  # pre-broadcast [(k2,b8), k1]
                    else:
                        kt = jnp.broadcast_to(kh[:, None, :], (n2, nb, n1))
                        kt = kt.reshape(LANE, LANE)  # rows (k2, b8)
                    acc.add(dhat_ref[i] * kt[None], pb)
                u, ub = acc.fast()
                uhats.append(u)                  # [nc, (k2,b8), k1]
        return jnp.stack(uhats)                  # [kp1*NS, nc, .., ..]

    def inverse(pi, p, uall, work_ref, res_ref, nc):
        if "inv" in ablate:
            res_ref[...] = uall.reshape(kp1, NS, nc, LANE, LANE)
            return
        u0, u1 = _split2(uall)
        for kk in range(n2):
            rows = slice(kk * nb, (kk + 1) * nb)
            a0 = u0[:, :, rows, :].reshape(kp1 * NS * nc * nb, LANE)
            a1 = u1[:, :, rows, :].reshape(kp1 * NS * nc * nb, LANE)
            wl = w1i_ref[pi, kk]
            t, tb = _modc_f(_dot8(a0, wl[1]) + _dot8(a1, wl[0])
                            + (_dot8(a1, wl[1]) << 8),
                            (1 << 22) + (1 << 29), p)
            qv, qb = _modc_f(_dot8(a0, wl[0]) + (t << 8),
                             (1 << 21) + (tb << 8), p)
            work_ref[:, rows, :] = qv.reshape(kp1 * NS * nc, nb, LANE)
        qt = jnp.swapaxes(work_ref[...], 1, 2)   # rows j1, lanes (k2,b8)
        # Near-centered (|.| <= 0.51p) is all the centered-Garner CRT in crt_accum needs — skip the
        # exact-centering select pass of exact=True on this largest tensor.
        res, _ = _stage_dots(
            qt.reshape(kp1 * NS * nc * LANE, LANE),
            wblki_ref[pi], p, exact=False)
        res_ref[...] = res.reshape(kp1, NS, nc, LANE, LANE)

    def crt_accum(res0_ref, res1_ref, cs):
        # ---- 2-prime CRT + u32 recombine + accumulate ---------------------
        # res is already in packed accumulator layout [nc, j1, (j2, b8)]:
        # the accumulate is a plain add, no output relayout.  Two pass cuts
        # vs the naive per-plane loop: (a) the Garner quotient x2c for ALL
        # kp1*NS planes runs as ONE big-tensor chain (same element count,
        # 1/8 the op launches); (b) by the exact integer identity
        #   sum_s (v0_s + P1*x2c_s) << 8s
        #     == (sum_s v0_s << 8s) + P1 * (sum_s x2c_s << 8s)   (mod 2^32)
        # the P1-multiply hoists out of the plane loop (one multiply per
        # jout instead of per plane); u32 wraparound encodes the negatives.
        # Each v0_s + P1*x2c_s equals the plane's exact integer W_s by the
        # centered-Garner uniqueness argument: res holds NEAR-centered
        # residues straight off _modc_f (|v_i| <= ~0.51*p_i, no exact-
        # centering pass needed), and with x2c any near-centered
        # representative of (v2 - v1) * P1^{-1} (mod P2), the candidate
        # v1 + P1*x2c is congruent to W_s mod M2 and bounded by
        # 0.51*P1 + P1*(0.5063*P2 + 2) < 1.275e9 = 0.507*M2, while
        # W_s + M2*k for k != 0 has magnitude >= M2 - 0.49*M2 = 1.283e9 —
        # so the candidate IS W_s exactly, in int32 (the wrapper asserts
        # max_plane_value < 0.49*M2).  |t*INV_c| <= CRT_T_BOUND fits int32.
        P1c, P2c = PRIMES2
        if "crt" in ablate:
            for jout in range(kp1):
                ext = None
                for si in range(NS):
                    cu = res0_ref[jout, si].astype(jnp.uint32)
                    w = (cu << np.uint32(8 * (s0 + si))) if (s0 + si) else cu
                    ext = w if ext is None else ext + w
                acc_s[jout, cs] = acc_s[jout, cs] + ext
            return
        inv_c = _center(np.array(_INV_P1_P2), P2c)
        v0 = res0_ref[...]                       # [kp1, NS, nc, L, L] int32
        t = res1_ref[...] - v0
        x2c, _ = _modc_f(t * np.int32(inv_c), CRT_T_BOUND, P2c)
        v0u, x2u = v0.astype(jnp.uint32), x2c.astype(jnp.uint32)
        for jout in range(kp1):
            sv = sx = None
            for si in range(NS):
                s_pl = s0 + si
                w0 = (v0u[jout, si] << np.uint32(8 * s_pl)) if s_pl \
                    else v0u[jout, si]
                w2 = (x2u[jout, si] << np.uint32(8 * s_pl)) if s_pl \
                    else x2u[jout, si]
                sv = w0 if sv is None else sv + w0
                sx = w2 if sx is None else sx + w2
            acc_s[jout, cs] = acc_s[jout, cs] + sv + np.uint32(P1c) * sx

    P0, P1 = PRIMES2
    if not halves:
        A = front(slice(0, C), C)
        db0 = fwd(0, P0, dhat_r[0], C, A)
        db1 = fwd(1, P1, dhat_r[1], C, A)
        u0 = pointwise(0, P0, db0, dhat_r[0], C)
        inverse(0, P0, u0, work_r[0], res_r[0], C)
        u1 = pointwise(1, P1, db1, dhat_r[1], C)
        inverse(1, P1, u1, work_r[1], res_r[1], C)
        crt_accum(res_r[0], res_r[1], slice(0, C))
    else:
        # Two independent half-tiles software-pipelined in program order so
        # every VPU stage sits between MXU stages it does not depend on
        # (chain index = prime * 2 + half).
        CH = C // 2
        H0, H1 = slice(0, CH), slice(CH, C)
        A0 = front(H0, CH)                               # VPU
        db00 = fwd(0, P0, dhat_r[0], CH, A0)             # MXU
        A1 = front(H1, CH)                               # VPU
        db10 = fwd(1, P1, dhat_r[2], CH, A0)             # MXU
        u00 = pointwise(0, P0, db00, dhat_r[0], CH)      # VPU
        db01 = fwd(0, P0, dhat_r[1], CH, A1)             # MXU
        inverse(0, P0, u00, work_r[0], res_r[0], CH)     # MXU
        u10 = pointwise(1, P1, db10, dhat_r[2], CH)      # VPU
        db11 = fwd(1, P1, dhat_r[3], CH, A1)             # MXU
        inverse(1, P1, u10, work_r[2], res_r[2], CH)     # MXU
        u01 = pointwise(0, P0, db01, dhat_r[1], CH)      # VPU
        inverse(0, P0, u01, work_r[1], res_r[1], CH)     # MXU
        crt_accum(res_r[0], res_r[2], H0)                # VPU
        u11 = pointwise(1, P1, db11, dhat_r[3], CH)      # VPU
        inverse(1, P1, u11, work_r[3], res_r[3], CH)     # MXU
        crt_accum(res_r[1], res_r[3], H1)                # VPU (exposed tail)

    @pl.when(j == n_steps - 1)
    def _():
        out_ref[...] = acc_s[...]


@functools.partial(jax.jit, static_argnames=("n_poly", "base_log", "ell",
                                              "b_tile", "interpret",
                                              "approx", "halves", "ablate"))
def blind_rotate_fused32(acc_hi: jnp.ndarray, amounts: jnp.ndarray,
                         khat: jnp.ndarray, consts: dict, *, n_poly: int,
                         base_log: int, ell: int, b_tile: int = 128,
                         interpret: bool = False, approx: bool = False,
                         halves: bool = False,
                         ablate: str = "") -> jnp.ndarray:
    """Run the whole 32-bit blind rotation in one kernel.

    acc_hi: u32 [B, kp1, N] initial accumulator hi plane (body = rotated
            test poly; the u64 lo plane is identically zero in turbo mode);
    amounts: int32 [B, n_steps] per-step rotation amounts in [0, 2N);
    khat: int16 [n_steps, 2, R, kp1, 4, n2, n1] (keys.pack_bsk_ntt32);
    consts: from pack_fused32_consts(n_poly);
    halves: split each batch tile into two independent half-tiles and
            interleave their stages in program order (MXU/VPU overlap
            experiment; bit-identical output).

    Returns u32 [B, kp1, N]: the final accumulator hi plane, bit-identical
    to numpy_ref.blind_rotate's hi limb (approx=True: min_shift=5 oracle).
    """
    B, kp1, n = acc_hi.shape
    n_steps = amounts.shape[1]
    assert khat.shape[0] == n_steps and khat.shape[1] == len(PRIMES2)
    num_r = khat.shape[2]
    assert num_r == kp1 * ell and khat.shape[4] == NUM_LB32
    # khat rows: [n2, n1] compact (broadcast nb-wise in-kernel; the
    # production layout keys.pack_bsk_ntt32 emits) or the pre-broadcast
    # [(k2, b8) = LANE, n1] layout (np.repeat(khat, nb, axis=-2); producer:
    # benchmarks/micro_fused32.py --ktwide): trades 8x khat HBM/VMEM
    # footprint for zero per-use broadcast relayouts in the pointwise
    # stage — measured +2% on v5e, NOT the production default.
    assert khat.shape[-2] in (n // LANE, LANE), khat.shape
    kt_wide = khat.shape[-2] == LANE and n // LANE != LANE
    assert base_log == 8, "32-bit kernel assumes single-int8-limb digits"
    # 0.49: headroom for the centered-Garner CRT's ~0.507*M2 candidate
    # bound (see crt_accum's centered-Garner note); the turbo shapes sit at 0.08*M2.
    assert max_plane_value(num_r, n) < int(0.49 * M2)
    n1, n2 = LANE, n // LANE
    nb = LANE // n2
    bt = min(b_tile, B)
    while B % bt or bt % nb:
        bt //= 2
    assert bt >= nb, (B, b_tile, nb)
    C = bt * n // (LANE * LANE)
    grid = (B // bt, n_steps)
    if halves and C % 2:
        halves = False  # tile too small to split

    s0 = 1 if approx else 0
    NS = NUM_LB32 - s0
    kshape = khat.shape
    CT = B * n // (LANE * LANE)  # total packed chunks
    # Natural [B, kp1, N] -> packed [kp1, C_total, j1, (j2, b8)] once per
    # call (see the kernel's layout note); XLA pays two whole-batch
    # relayouts per PBS call, amortized over all n_steps grid steps.
    acc_p = jnp.transpose(
        acc_hi.reshape(B // nb, nb, kp1, n2, n1), (2, 0, 4, 3, 1)
    ).reshape(kp1, CT, n1, LANE)
    # Per-item rotation amounts in packed lane order: lane j2*nb + b8
    # carries item b = c*nb + b8 (j2-invariant).
    amt_p = jnp.broadcast_to(
        jnp.transpose(amounts.astype(jnp.int32)).reshape(
            n_steps, B // nb, 1, 1, nb),
        (n_steps, B // nb, 1, n2, nb)).reshape(n_steps, B // nb, 1, LANE)
    CC = C // 2 if halves else C          # chunks per (prime, half) chain
    n_chains = 4 if halves else 2
    out = pl.pallas_call(
        functools.partial(_fused32_kernel, n=n, bt=bt, num_r=num_r, ell=ell,
                          kp1=kp1, n_steps=n_steps, base_log=base_log,
                          s0=s0, halves=halves, kt_wide=kt_wide,
                          ablate=ablate),
        grid=grid,
        in_specs=[
            pl.BlockSpec((kp1, C, n1, LANE), lambda b, j: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 1, LANE), lambda b, j: (j, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + kshape[1:], lambda b, j: (j,) + (0,) * 6,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(consts["wblkf"].shape, lambda b, j: (0,) * 4,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(consts["w1f"].shape, lambda b, j: (0,) * 5,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(consts["w1i"].shape, lambda b, j: (0,) * 5,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(consts["wblki"].shape, lambda b, j: (0,) * 4,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kp1, C, n1, LANE), lambda b, j: (0, b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kp1, CT, n1, LANE), jnp.uint32),
        scratch_shapes=(
            [pltpu.VMEM((kp1, C, n1, LANE), jnp.uint32)]            # acc
            + [pltpu.VMEM((num_r, CC, LANE, LANE), jnp.int32)       # dhat
               for _ in range(n_chains)]
            + [pltpu.VMEM((kp1 * NS * CC, LANE, LANE), jnp.int32)   # work
               for _ in range(n_chains)]
            + [pltpu.VMEM((kp1, NS, CC, LANE, LANE), jnp.int32)     # res
               for _ in range(n_chains)]
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(acc_p, amt_p, khat,
      consts["wblkf"], consts["w1f"], consts["w1i"], consts["wblki"])
    # packed -> natural
    return jnp.transpose(
        out.reshape(kp1, B // nb, n1, n2, nb), (1, 4, 0, 3, 2)
    ).reshape(B, kp1, n)
