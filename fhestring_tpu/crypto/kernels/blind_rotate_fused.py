"""Pallas TPU kernel: the ENTIRE blind rotation as one fused kernel.

One pallas_call runs all n LWE steps for a batch tile with the GLWE
accumulator resident in VMEM scratch the whole time:

    grid = (B/bt, n_steps)          # steps innermost; acc persists per tile
    per cell:  shear-rotate acc by a_j -> diff -> gadget decompose ->
               int8 limb planes -> negacyclic 3-prime NTT external product
               (crypto/ntt2.py math) -> CRT -> acc += ext (u64, in VMEM)

vs the two-kernel path (rotate_decompose.py + ntt_ext.py) this removes, per
step: two kernel launches, the digit-limb HBM round trip, the accumulator
HBM round trips, and the XLA u64-add glue — ~190 MB/step of HBM traffic
becomes ~0.4 MB (the step's NTT-domain key, streamed by the Pallas
pipeline with double buffering).

It also folds BOTH NTT twiddles into the stage matrices: the forward
twiddle psi^{j1} w^{j1 k2} multiplies the dense stage-2 weights (n2 per-k2
matrix variants, selected by slicing the k2-major row blocks), and the
inverse twiddle likewise multiplies the inverse dense stage — eliminating
two VPU multiply+reduce passes per transform.  MAC count is unchanged;
weight VMEM grows by ~3 MB of constants.

Exactness contract is identical to ntt_ext.py: the final accumulator is
bit-identical to numpy_ref.blind_rotate.  See ntt_ext.py for the layout
strategy ([C, 128, 128] chunks, batched square transposes) and the
approximate-Barrett reduction scheme.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ntt import _center, omega_root
from ..ntt2 import GROUP, NUM_GROUPS, NUM_LB, PRIMES3
from .ntt_ext import (LANE, _Acc, _add64, _dot8, _modc_f, _shl64, _split2,
                      _stage_dots, crt3_u64, _limbs8)


def pack_fused_consts(n: int, num_la: int = 3):
    """Twiddle-folded stage constants (see module docstring).

    Shapes (P = 3 primes, n2 = n/128, nb = 128/n2):
      wblkf [P, La, 2, 128, 128] int8  stage-1 blockdiag, in-col (b8, j2) ->
            out-col (k2, b8); entry psi^{n1 j2} w^{n1 j2 k2} * 256^la
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

        w2f = pw(psi, n1 * j2[:, None] + 0 * k2[None, :]) \
            * pw(w, n1 * j2[:, None] * k2[None, :]) % p        # [j2, k2]
        las = []
        for la in range(num_la):
            blk = np.zeros((LANE, LANE), np.int64)
            scaled = w2f * pow(256, la, p) % p
            for b in range(nb):
                # in-col b*n2 + j2  ->  out-col k2*nb + b
                blk[b * n2:(b + 1) * n2, b::nb] = scaled
            las.append(_limbs8(_center(blk, p)))
        wblkf.append(np.stack(las))

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
            # in-col k2*nb + b  ->  out-col b*n2 + j2
            blk[b::nb, b * n2:(b + 1) * n2] = w2i
        wblki.append(_limbs8(_center(blk, p)))

    as_j = lambda x: jnp.asarray(np.stack(x))
    return {"wblkf": as_j(wblkf), "w1f": as_j(w1f), "w1i": as_j(w1i),
            "wblki": as_j(wblki)}


def _neg_u64(lo, hi):
    nlo = jnp.zeros_like(lo) - lo
    borrow = (lo != 0).astype(jnp.uint32)
    nhi = jnp.zeros_like(hi) - hi - borrow
    return nlo, nhi


def _fused_kernel(acc0lo_ref, acc0hi_ref, amt_ref, khat_ref, wblkf_ref,
                  w1f_ref, w1i_ref, wblki_ref, lo_ref, hi_ref,
                  acclo_s, acchi_s, dhat_ref, work_ref, res_ref, *,
                  n: int, bt: int, num_la: int, num_r: int, kp1: int,
                  n_steps: int, base_log: int, rounded: bool, g0: int,
                  ablate: str = ""):
    n1, n2 = LANE, n // LANE
    nb = LANE // n2
    C = bt * n // (LANE * LANE)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acclo_s[...] = acc0lo_ref[...]
        acchi_s[...] = acc0hi_ref[...]

    hi = acchi_s[...]                              # [bt, kp1, N] u32
    amt3 = amt_ref[...].reshape(bt, 1, 1).astype(jnp.int32)
    t_iota = jax.lax.broadcasted_iota(jnp.int32, hi.shape, 2)
    bits = (2 * n).bit_length() - 1
    shift = 64 - base_log
    assert shift >= 33
    sh = shift - 32

    if "shear" in ablate:
        # ablation: skip rotation/decomposition, digits = raw top plane
        d = (hi >> jnp.uint32(sh)).astype(jnp.int32) & jnp.int32(
            (1 << base_log) - 1)
        d = d - ((d >= (1 << (base_log - 1))).astype(jnp.int32)
                 << base_log)
    elif rounded:
        # ---- ROUNDED decomposition (numpy_ref.cmux_rounded semantics) ----
        # Shear only the B-bit pre-rounded plane: one int32 plane instead of
        # the u64 accumulator; decomposition error grows <= ~5x in std-dev,
        # far inside the parameter budget (see cmux_rounded docstring).
        maski = jnp.int32((1 << base_log) - 1)
        ar = (((hi >> jnp.uint32(sh)) + ((hi >> jnp.uint32(sh - 1))
                                         & jnp.uint32(1)))
              .astype(jnp.int32) & maski)           # [bt, kp1, N] in [0, 2^B)
        rr = ar
        for k in range(bits):
            s = 1 << k
            if s >= n:
                nr = (jnp.int32(1 << base_log) - rr) & maski
            else:
                nr = pltpu.roll(rr, s, 2)
                nr = jnp.where(t_iota < s,
                               (jnp.int32(1 << base_log) - nr) & maski, nr)
            take = ((amt3 >> k) & 1) == 1
            rr = jnp.where(take, nr, rr)
        state = (rr - ar) & maski
        ge = (state >= jnp.int32(1 << (base_log - 1))).astype(jnp.int32)
        d = state - (ge << base_log)               # [bt, kp1, N] signed digit
    else:
        lo = acclo_s[...]
        # ---- negacyclic rotation by per-item amounts (12-stage shear) ----
        rlo, rhi = lo, hi
        for k in range(bits):
            s = 1 << k
            if s >= n:
                nlo, nhi = _neg_u64(rlo, rhi)
            else:
                nlo = pltpu.roll(rlo, s, 2)
                nhi = pltpu.roll(rhi, s, 2)
                wrap = t_iota < s
                neg_lo, neg_hi = _neg_u64(nlo, nhi)
                nlo = jnp.where(wrap, neg_lo, nlo)
                nhi = jnp.where(wrap, neg_hi, nhi)
            take = ((amt3 >> k) & 1) == 1
            rlo = jnp.where(take, nlo, rlo)
            rhi = jnp.where(take, nhi, rhi)

        # ---- diff + gadget decomposition (ell = 1) -----------------------
        dlo = rlo - lo
        borrow = (rlo < lo).astype(jnp.uint32)
        dhi = rhi - hi - borrow
        state = (dhi >> jnp.uint32(sh)) + ((dhi >> jnp.uint32(sh - 1))
                                           & jnp.uint32(1))
        base = jnp.uint32((1 << base_log) - 1)
        half = jnp.uint32(1 << (base_log - 1))
        d = (state & base).astype(jnp.int32)
        carry = (d >= half.astype(jnp.int32)).astype(jnp.int32)
        d = d - (carry << base_log)                # [bt, kp1, N] signed digit

    # ---- balanced int8 limbs + T1 transposes ------------------------------
    A_las = []
    state_i = d
    for la in range(num_la):
        limb = (((state_i + 128) & 255) - 128)
        state_i = (state_i - limb) >> 8
        xts = []
        for i in range(num_r):
            x3 = limb[:, i, :].reshape(C, LANE, LANE)
            xts.append(jnp.swapaxes(x3, 1, 2).astype(jnp.int8))
        A_las.append(jnp.concatenate(xts, axis=0)
                     .reshape(num_r * C * LANE, LANE))

    # g0 > 0 = approx mode: output shift planes s = la+lb < 3*g0 are dropped
    # entirely (pointwise pairs, inverse transforms, CRT) — the truncation
    # error is low-order noise inside the parameter budget, mirroring
    # tfhe-rs's f64 FFT error (oracle: numpy_ref.polymul_planes).
    NG = NUM_GROUPS - g0
    pairs = [[(la, lb) for la in range(num_la) for lb in range(NUM_LB)
              if la + lb < NUM_LB and (la + lb) // GROUP == g]
             for g in range(NUM_GROUPS)]

    for pi, p in enumerate(PRIMES3):
        # ---- forward ------------------------------------------------------
        db = 0
        if "fwd" in ablate:
            db = 128
            for la in range(num_la):
                dhat_ref[la] = A_las[la].astype(jnp.int32).reshape(
                    num_r, C, LANE, LANE)
        else:
            for la in range(num_la):
                s_raw = (_dot8(A_las[la], wblkf_ref[pi, la, 0]).astype(jnp.int32)
                         + (_dot8(A_las[la], wblkf_ref[pi, la, 1]) << 8))
                sv, sb = _modc_f(s_raw, (1 << 21) + (1 << 29), p)
                sv = sv.reshape(num_r * C, LANE, LANE)  # rows j1, lanes (k2,b8)
                st = jnp.swapaxes(sv, 1, 2)             # rows (k2,b8), lanes j1
                z0, z1 = _split2(st)
                for kk in range(n2):
                    rows = slice(kk * nb, (kk + 1) * nb)
                    a0 = z0[:, rows, :].reshape(num_r * C * nb, LANE)
                    a1 = z1[:, rows, :].reshape(num_r * C * nb, LANE)
                    wl = w1f_ref[pi, kk]
                    t, tb = _modc_f(_dot8(a0, wl[1]) + _dot8(a1, wl[0])
                                    + (_dot8(a1, wl[1]) << 8),
                                    (1 << 22) + (1 << 29), p)
                    dv, db = _modc_f(_dot8(a0, wl[0]) + (t << 8),
                                     (1 << 21) + (tb << 8), p)
                    dhat_ref[la, :, :, rows, :] = dv.reshape(
                        num_r, C, nb, LANE)

        # ---- pointwise + group scale ---------------------------------------
        if "pw" in ablate:
            uall = jnp.broadcast_to(
                dhat_ref[0, 0][None],
                (kp1 * NG, C, LANE, LANE)).astype(jnp.int32) & 0x7FFF
            uhats = None
        else:
            uhats = []
            pb = db * ((p - 1) // 2)
            for jout in range(kp1):
                for g in range(g0, NUM_GROUPS):
                    acc = _Acc(p)
                    for (la, lb) in pairs[g]:
                        for i in range(num_r):
                            kh = khat_ref[0, pi, i, jout, lb].astype(jnp.int32)
                            kt = jnp.broadcast_to(kh[:, None, :], (n2, nb, n1))
                            kt = kt.reshape(LANE, LANE)    # rows (k2, b8)
                            acc.add(dhat_ref[la, i] * kt[None], pb)
                    u, ub = acc.fast()
                    if g:
                        sc = _center(
                            np.array(pow(pow(256, 3 * g, p), p - 2, p)), p)
                        u, ub = _modc_f(u * np.int32(sc),
                                        ub * ((p - 1) // 2), p)
                    uhats.append(u)                    # [C, (k2,b8), k1]
            uall = jnp.stack(uhats)                    # [kp1*NG, C, .., ..]

        # ---- inverse --------------------------------------------------------
        if "inv" in ablate:
            res_ref[pi] = uall.reshape(kp1, NG, C, LANE, LANE)
        else:
            u0, u1 = _split2(uall)
            for kk in range(n2):
                rows = slice(kk * nb, (kk + 1) * nb)
                a0 = u0[:, :, rows, :].reshape(kp1 * NG * C * nb, LANE)
                a1 = u1[:, :, rows, :].reshape(kp1 * NG * C * nb, LANE)
                wl = w1i_ref[pi, kk]
                t, tb = _modc_f(_dot8(a0, wl[1]) + _dot8(a1, wl[0])
                                + (_dot8(a1, wl[1]) << 8),
                                (1 << 22) + (1 << 29), p)
                qv, qb = _modc_f(_dot8(a0, wl[0]) + (t << 8),
                                 (1 << 21) + (tb << 8), p)
                work_ref[:, rows, :] = qv.reshape(
                    kp1 * NG * C, nb, LANE)
            qt = jnp.swapaxes(work_ref[...], 1, 2)     # rows j1, lanes (k2,b8)
            res, _ = _stage_dots(
                qt.reshape(kp1 * NG * C * LANE, LANE),
                wblki_ref[pi], p, exact=True)
            res_ref[pi] = res.reshape(kp1, NG, C, LANE, LANE)

    # ---- CRT + u64 recombine + accumulate into acc -------------------------
    for jout in range(kp1):
        elo = ehi = None
        for g in range(g0, NUM_GROUPS):
            if "crt" in ablate:
                glo = res_ref[0, jout, g - g0].astype(jnp.uint32)
                ghi = res_ref[1, jout, g - g0].astype(jnp.uint32)
            else:
                glo, ghi = crt3_u64(res_ref[0, jout, g - g0],
                                    res_ref[1, jout, g - g0],
                                    res_ref[2, jout, g - g0])
            glo, ghi = _shl64(glo, ghi, 24 * g)
            if elo is None:
                elo, ehi = glo, ghi
            else:
                elo, ehi = _add64(elo, ehi, glo, ghi)
        # packed [C, j1, (b8, j2)] -> natural [bt, N]
        nat_lo = jnp.swapaxes(elo, 1, 2).reshape(bt, n)
        nat_hi = jnp.swapaxes(ehi, 1, 2).reshape(bt, n)
        alo = acclo_s[:, jout, :]
        ahi = acchi_s[:, jout, :]
        slo = alo + nat_lo
        acclo_s[:, jout, :] = slo
        acchi_s[:, jout, :] = ahi + nat_hi + (slo < nat_lo).astype(jnp.uint32)

    @pl.when(j == n_steps - 1)
    def _():
        lo_ref[...] = acclo_s[...].reshape(bt, kp1 * n)
        hi_ref[...] = acchi_s[...].reshape(bt, kp1 * n)


@functools.partial(jax.jit, static_argnames=("n_poly", "base_log", "b_tile",
                                              "interpret", "rounded",
                                              "approx", "ablate"))
def blind_rotate_fused(acc_lo: jnp.ndarray, acc_hi: jnp.ndarray,
                       amounts: jnp.ndarray, khat: jnp.ndarray, consts: dict,
                       *, n_poly: int, base_log: int, b_tile: int = 128,
                       interpret: bool = False, rounded: bool = False,
                       approx: bool = False, ablate: str = ""):
    """Run the whole blind rotation in one kernel.

    acc_*: u32 [B, kp1, N] initial accumulator (body = rotated test poly);
    amounts: int32 [B, n_steps] per-step rotation amounts in [0, 2N);
    khat: int16 [n_steps, 3, R, kp1, 8, n2, n1] (keys.pack_bsk_ntt2);
    consts: from pack_fused_consts(n_poly).

    Returns (lo, hi) u32 [B, kp1, N]: the final accumulator, bit-identical
    to numpy_ref.blind_rotate(rounded=rounded, min_shift=3 if approx else 0).
    approx=True drops external-product limb planes below 256^3 — a budgeted
    low-order noise term (the analog of tfhe-rs's f64 FFT error) that removes
    one of the three inverse transforms and a third of the pointwise work.
    """
    B, kp1, n = acc_lo.shape
    n_steps = amounts.shape[1]
    assert khat.shape[0] == n_steps
    num_r = khat.shape[2]
    # Digit-limb count is set by the gadget base: |digit| <= 2^(base_log-1).
    # The caller's consts were packed with the same value (wblkf's La axis);
    # a mismatch would silently mis-index the folded twiddles.
    num_la = (base_log + 8) // 8
    assert consts["wblkf"].shape[1] == num_la, (
        consts["wblkf"].shape, base_log)
    n1, n2 = LANE, n // LANE
    nb = LANE // n2
    bt = min(b_tile, B)
    while B % bt or bt % nb:
        bt //= 2
    assert bt >= nb, (B, b_tile, nb)
    C = bt * n // (LANE * LANE)
    grid = (B // bt, n_steps)

    g0 = 1 if approx else 0
    NG = NUM_GROUPS - g0
    kshape = khat.shape
    lo, hi = pl.pallas_call(
        functools.partial(_fused_kernel, n=n, bt=bt, num_la=num_la,
                          num_r=num_r, kp1=kp1, n_steps=n_steps,
                          base_log=base_log, rounded=rounded, g0=g0,
                          ablate=ablate),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, kp1, n), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, kp1, n), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, 1), lambda b, j: (j, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + kshape[1:], lambda b, j: (j,) + (0,) * 6,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(consts["wblkf"].shape, lambda b, j: (0,) * 5,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(consts["w1f"].shape, lambda b, j: (0,) * 5,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(consts["w1i"].shape, lambda b, j: (0,) * 5,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(consts["wblki"].shape, lambda b, j: (0,) * 4,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, kp1 * n), lambda b, j: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, kp1 * n), lambda b, j: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, kp1 * n), jnp.uint32),
            jax.ShapeDtypeStruct((B, kp1 * n), jnp.uint32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bt, kp1, n), jnp.uint32),                  # acc lo
            pltpu.VMEM((bt, kp1, n), jnp.uint32),                  # acc hi
            pltpu.VMEM((num_la, num_r, C, LANE, LANE), jnp.int32),  # dhat
            pltpu.VMEM((kp1 * NG * C, LANE, LANE), jnp.int32),
            pltpu.VMEM((3, kp1, NG, C, LANE, LANE), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(acc_lo, acc_hi,
      jnp.transpose(amounts.astype(jnp.int32))[:, :, None], khat,
      consts["wblkf"], consts["w1f"], consts["w1i"], consts["wblki"])
    return lo.reshape(B, kp1, n), hi.reshape(B, kp1, n)
