"""Pallas TPU kernel: per-step blind-rotation prologue, fused.

Per blind-rotation step j, the accumulator update needs
``diff = acc * X^{a_j} - acc`` followed by gadget decomposition and int8
limb-splitting of the digits — four elementwise passes over the u64
accumulator.  In XLA each shear stage / op materializes to HBM (~1.5 ms of
traffic per step at B=1024, production N); this kernel does all of it in
one VMEM round trip:

  1. negacyclic rotation by per-item a_j in [0, 2N): 12-stage log-shear
     (static lane roll + wraparound negation + per-item bit select),
  2. u64 subtract (diff),
  3. balanced gadget decomposition (ell = 1, matching crypto/pbs.decompose),
  4. balanced int8 limb split (matching pbs.balanced_limbs_i32),

emitting digit limbs ``dl int8 [num_la, B, (k+1)*N]`` in natural
coefficient order (the caller flips c within each i block — one cheap XLA
pass — before the external-product kernel).

HBM traffic per step: read 8*B*(k+1)*N bytes of acc + write
num_la*B*(k+1)*N bytes of limbs; everything else stays in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _neg_u64(lo, hi):
    """-(v) mod 2^64 on u32 limb pairs."""
    nlo = jnp.zeros_like(lo) - lo
    borrow = (lo != 0).astype(jnp.uint32)
    nhi = jnp.zeros_like(hi) - hi - borrow
    return nlo, nhi


def _rotate_decompose_kernel(acc_lo_ref, acc_hi_ref, amt_ref, out_ref,
                             *, n_poly: int, kp1: int, base_log: int,
                             num_la: int):
    """One b-tile: rotate+diff+decompose+limb-split entirely in VMEM.

    acc_*_ref: [bt, kp1, N] u32; amt_ref: [bt, 1] int32 (column vector);
    out_ref: [num_la, bt, kp1*N] int8.
    """
    lo = acc_lo_ref[...]
    hi = acc_hi_ref[...]
    bt = lo.shape[0]
    amt = amt_ref[...]  # [bt, 1]
    amt3 = amt[:, :, None]  # [bt, 1, 1]

    t_iota = jax.lax.broadcasted_iota(jnp.int32, lo.shape, 2)

    # ---- negacyclic rotation by per-item amounts (12-stage shear) ----
    # (A sign-tracking variant with one deferred negation measured SLOWER:
    # the extra int32 sign-plane roll costs more than the per-stage u64
    # negations it saves — cross-lane rolls are the expensive op here.)
    rlo, rhi = lo, hi
    bits = (2 * n_poly).bit_length() - 1  # log2(2N)
    for k in range(bits):
        s = 1 << k
        if s >= n_poly:
            nlo, nhi = _neg_u64(rlo, rhi)  # rotation by N == global negation
        else:
            nlo = pltpu.roll(rlo, s, 2)
            nhi = pltpu.roll(rhi, s, 2)
            wrap = t_iota < s
            neg_lo, neg_hi = _neg_u64(nlo, nhi)
            nlo = jnp.where(wrap, neg_lo, nlo)
            nhi = jnp.where(wrap, neg_hi, nhi)
        take = ((amt3 >> k) & 1) == 1  # [bt,1,1] broadcasts
        rlo = jnp.where(take, nlo, rlo)
        rhi = jnp.where(take, nhi, rhi)

    # ---- diff = rotated - acc (u64) ----
    dlo = rlo - lo
    borrow = (rlo < lo).astype(jnp.uint32)
    dhi = rhi - hi - borrow

    # ---- gadget decomposition, ell = 1 (pbs.decompose semantics) ----
    shift = 64 - base_log  # = 41 for base_log 23; >= 32 assumed
    assert shift >= 33, "ell=1 kernel assumes base_log < 32"
    sh = shift - 32
    state = (dhi >> jnp.uint32(sh)) + ((dhi >> jnp.uint32(sh - 1)) &
                                       jnp.uint32(1))
    base = jnp.uint32((1 << base_log) - 1)
    half = jnp.uint32(1 << (base_log - 1))
    d = (state & base).astype(jnp.int32)
    carry = (d >= half.astype(jnp.int32)).astype(jnp.int32)
    d = d - (carry << base_log)  # signed digit in (-B/2, B/2]

    # ---- balanced int8 limb split (pbs.balanced_limbs_i32 semantics) ----
    state_i = d
    for la in range(num_la):
        limb = ((state_i + 128) & 255) - 128
        out_ref[la] = limb.reshape(bt, kp1 * n_poly).astype(jnp.int8)
        state_i = (state_i - limb) >> 8


@functools.partial(jax.jit, static_argnames=("n_poly", "base_log", "num_la",
                                              "b_tile", "interpret"))
def rotate_diff_decompose(acc_lo: jnp.ndarray, acc_hi: jnp.ndarray,
                          amounts: jnp.ndarray, *, n_poly: int,
                          base_log: int, num_la: int, b_tile: int = 256,
                          interpret: bool = False) -> jnp.ndarray:
    """acc_*: u32 [B, kp1, N]; amounts: int32 [B] in [0, 2N).

    Returns dl int8 [num_la, B, kp1*N]: balanced limbs of the ell=1 digits
    of (acc * X^a - acc), natural coefficient order."""
    B, kp1, N = acc_lo.shape
    assert N == n_poly
    b_tile = min(b_tile, B)
    while B % b_tile:
        b_tile //= 2
    grid = (B // b_tile,)

    out = pl.pallas_call(
        functools.partial(_rotate_decompose_kernel, n_poly=n_poly, kp1=kp1,
                          base_log=base_log, num_la=num_la),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b_tile, kp1, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, kp1, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((num_la, b_tile, kp1 * N),
                               lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_la, B, kp1 * N), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(acc_lo, acc_hi, amounts.reshape(B, 1).astype(jnp.int32))
    return out
