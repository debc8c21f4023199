"""Pallas TPU kernel for the blind-rotation external product.

This is the speed-of-light core of the PBS (BASELINE.json north star): per
blind-rotation step, the decomposed accumulator digits (int8 limb planes)
multiply the step's bootstrap-key polynomials in the negacyclic ring
Z_{2^64}[X]/(X^N+1).  The product is evaluated exactly as int8 x int8 ->
int32 matmuls on the MXU:

    ext[b, jout, t] = sum_s 256^s * sum_{la+lb=s} sum_{i, c}
        D_la[b, i, c] * limb_lb(BSK[j][i, jout])[(t - c) mod± N]   (mod 2^64)

Measured design notes (v1 -> v3; see benchmarks/):
- The virtual negacyclic matrices of the key polynomials are never
  materialized in HBM.  Per (step, jout), ONE persistent VMEM "master"
  Hankel band ``master_i[r, lb*128+dt] = p4[i, jout, lb, r + dt + 1]``
  (rows r in [0, 3N)) is generated per input-row i with a 7-stage
  lane-shear; every 128-column output panel row-slices it.  v1 regenerated
  strips per (t-panel, jout) — ~0.6 ms/step of pure VPU time at production
  N, the dominant fixed cost.
- All 8 key limb planes (lb) are fused into the matmul's N dimension:
  [num_la*b_tile, N] @ [N, 8*128] per (i, panel) — 1024-wide MXU dots
  instead of eight 128-wide ones.
- The (la, lb) shift planes are recombined into u64 (2x uint32 limbs,
  carry-exact) INSIDE the kernel: the output is [B, k+1, N] x2 u32 instead
  of int32 planes [B, k+1, 8, N], an 8x cut in output HBM traffic.
- Grid is (jout,) only; each grid cell streams the batch once with
  double-buffered DMA and loops all t-panels per tile, so drev is read
  (k+1)x per step rather than (k+1)*t_panels x.

Replaces the concrete-fft negacyclic product inside tfhe-rs's PBS
(reference dependency; SURVEY.md section 2.3) — with exact integer
arithmetic, there is no FFT noise term at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128  # t-panel width
NUM_LB = 8  # key limb planes (u64 -> 8 bytes)


def _gen_master_band(w, rows: int):
    """w: int8 [rows + 2*LANE] window (128-aligned load).  Returns the
    Hankel band M[r, dt] = w[r + dt + 1] as int8 [rows, LANE] via log-shear.

    The +1 is applied as a final extra shift-up so the HBM load stays
    128-aligned (Mosaic can't reshape offset-sliced vectors)."""
    ext = rows + 2 * LANE
    # Mosaic constraints: minor-dim-inserting broadcasts AND rolls are
    # 32-bit-only; shear in int32 and cast back at the end.
    m = jnp.broadcast_to(w.astype(jnp.int32)[:, None], (ext, LANE))
    lane = jax.lax.broadcasted_iota(jnp.int32, (ext, LANE), 1)
    for k in range(7):  # shifts up to 127
        # shift-up by 2^k == positive circular roll by ext - 2^k
        rolled = pltpu.roll(m, ext - (1 << k), 0)
        bit = ((lane >> k) & 1) == 1
        m = jnp.where(bit, rolled, m)
    m = pltpu.roll(m, ext - 1, 0)  # the +1 row shift
    return m[:rows, :].astype(jnp.int8)


def _accum_u64(acc_lo, acc_hi, plane, s: int):
    """(acc_lo, acc_hi) += sign_extend64(plane) << (8*s), mod 2^64.

    plane: int32 [bt, LANE]; acc_*: uint32."""
    u = plane.astype(jnp.uint32)
    sign = (plane >> 31).astype(jnp.uint32)  # 0 or 0xFFFFFFFF
    sh = 8 * s
    if sh == 0:
        lo, hi = u, sign
    elif sh < 32:
        lo = u << sh
        hi = (sign << sh) | (u >> (32 - sh))
    else:
        lo = jnp.zeros_like(u)
        hi = u << (sh - 32)
    new_lo = acc_lo + lo
    carry = (new_lo < lo).astype(jnp.uint32)
    new_hi = acc_hi + hi + carry
    return new_lo, new_hi


def _ext_product_kernel(drev_hbm, p4_ref, lo_hbm, hi_hbm, masters, dtile,
                        otile, dma_sems, out_sem, *, n_poly: int, b_tile: int,
                        num_la: int, num_r: int, ablate: str = ""):
    """grid = (kp1_jout,); see module docstring for the contraction.

    masters: VMEM [num_r, 3N, 8*LANE] int8, generated once per grid cell.
    otile:   VMEM [2, b_tile, N] u32 (lo, hi).
    """
    rows = 3 * n_poly
    t_panels = n_poly // LANE

    if "gen" not in ablate:
        for i in range(num_r):
            for lb in range(NUM_LB):
                # master[r, dt] = p4[i, j, lb, r + dt + 1]
                w = p4_ref[i, 0, lb, pl.ds(0, rows + 2 * LANE)]
                masters[i, :, lb * LANE:(lb + 1) * LANE] = (
                    _gen_master_band(w, rows))

    num_b_tiles = drev_hbm.shape[1] // b_tile

    def get_dma(slot, bi):
        return pltpu.make_async_copy(
            drev_hbm.at[:, pl.ds(bi * b_tile, b_tile), :],
            dtile.at[slot],
            dma_sems.at[slot],
        )

    get_dma(0, 0).start()

    def body(bi, _):
        slot = bi % 2

        @pl.when(bi + 1 < num_b_tiles)
        def _():
            get_dma((bi + 1) % 2, bi + 1).start()

        get_dma(slot, bi).wait()

        if "dot" not in ablate:
            dcats = [
                dtile[slot][:, :, i * n_poly:(i + 1) * n_poly].reshape(
                    num_la * b_tile, n_poly)
                for i in range(num_r)
            ]
            for t in range(t_panels):
                r0 = t * LANE + n_poly
                acc = jnp.zeros((num_la * b_tile, NUM_LB * LANE), jnp.int32)
                for i in range(num_r):
                    acc = acc + jax.lax.dot(
                        dcats[i], masters[i, pl.ds(r0, n_poly), :],
                        preferred_element_type=jnp.int32)
                # Fold (la, lb) pairs into u64 via shift planes s = la + lb.
                lo = jnp.zeros((b_tile, LANE), jnp.uint32)
                hi = jnp.zeros((b_tile, LANE), jnp.uint32)
                for s in range(NUM_LB):
                    plane = None
                    for la in range(num_la):
                        lb = s - la
                        if lb < 0 or lb >= NUM_LB:
                            continue
                        part = acc[la * b_tile:(la + 1) * b_tile,
                                   lb * LANE:(lb + 1) * LANE]
                        plane = part if plane is None else plane + part
                    if plane is None:
                        continue
                    lo, hi = _accum_u64(lo, hi, plane, s)
                otile[0, :, t * LANE:(t + 1) * LANE] = lo
                otile[1, :, t * LANE:(t + 1) * LANE] = hi

        if "out" not in ablate:
            # outputs are [B, kp1*N]: column-sliced at j*N (lane-aligned);
            # a middle-dim slice of [B, kp1, N] would break Mosaic tiling.
            j = pl.program_id(0)
            copy_lo = pltpu.make_async_copy(
                otile.at[0],
                lo_hbm.at[pl.ds(bi * b_tile, b_tile),
                          pl.ds(j * n_poly, n_poly)],
                out_sem,
            )
            copy_lo.start()
            copy_lo.wait()
            copy_hi = pltpu.make_async_copy(
                otile.at[1],
                hi_hbm.at[pl.ds(bi * b_tile, b_tile),
                          pl.ds(j * n_poly, n_poly)],
                out_sem,
            )
            copy_hi.start()
            copy_hi.wait()
        return 0

    jax.lax.fori_loop(0, num_b_tiles, body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("n_poly", "b_tile", "interpret",
                                              "ablate"))
def ext_product_u64(drev: jnp.ndarray, p4: jnp.ndarray, *,
                    n_poly: int, b_tile: int = 128,
                    interpret: bool = False, ablate: str = ""):
    """Pallas entry: drev int8 [num_la, B, R*N] (digit limbs with the
    c-axis REVERSED within each i-block), p4 int8 [R, k+1, 8, 4N]
    (quadrupled key limb planes, [i, jout, lb]).

    Returns (lo, hi) uint32 [B, k+1, N]: the external-product GLWE delta
    recombined mod 2^64."""
    num_la, B, kn = drev.shape
    num_r = p4.shape[0]
    kp1 = p4.shape[1]
    assert kn == num_r * n_poly
    assert B % b_tile == 0, (B, b_tile)
    # generation reads p4[0 : 3N + 2*LANE], so 3N + 2*LANE <= 4N
    assert n_poly % LANE == 0 and n_poly >= 2 * LANE, "need N >= 256"

    grid = (kp1,)
    lo, hi = pl.pallas_call(
        functools.partial(_ext_product_kernel, n_poly=n_poly, b_tile=b_tile,
                          num_la=num_la, num_r=num_r, ablate=ablate),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # drev stays in HBM
            pl.BlockSpec((num_r, 1, NUM_LB, 4 * n_poly),
                         lambda j: (0, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, kp1 * n_poly), jnp.uint32),
            jax.ShapeDtypeStruct((B, kp1 * n_poly), jnp.uint32),
        ],
        scratch_shapes=[
            pltpu.VMEM((num_r, 3 * n_poly, NUM_LB * LANE), jnp.int8),  # masters
            pltpu.VMEM((2, num_la, b_tile, num_r * n_poly), jnp.int8),  # D dbuf
            pltpu.VMEM((2, b_tile, n_poly), jnp.uint32),  # out tile (lo, hi)
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(drev, p4)
    return lo.reshape(B, kp1, n_poly), hi.reshape(B, kp1, n_poly)


def ext_product_planes_reference(drev: jnp.ndarray, p4: jnp.ndarray, *,
                                 n_poly: int) -> jnp.ndarray:
    """jnp reference with identical pre-recombination semantics (CPU tests).

    Returns int32 planes [B, k+1, 8, N]; recombine with
    ``sum_s 256^s * sign_extend(plane_s) mod 2^64`` to match
    ext_product_u64."""
    num_la, B, kn = drev.shape
    kp1 = p4.shape[1]
    two_n = 2 * n_poly
    t = jnp.arange(n_poly)
    # strips: R[i, jout, lb, c', t] = p2[(t - (N-1-c')) mod 2N]
    cprime = jnp.arange(n_poly)
    idx = (t[None, :] - (n_poly - 1 - cprime)[:, None]) % two_n  # [N, N]
    p2 = p4[..., :two_n]
    mats = p2[:, :, :, idx]  # [i, jout, lb, c', t]
    out = jnp.zeros((B, kp1, NUM_LB, n_poly), jnp.int32)
    d = drev.reshape(num_la, B, p4.shape[0], n_poly)
    for s in range(NUM_LB):
        for la in range(num_la):
            lb = s - la
            if lb < 0 or lb >= NUM_LB:
                continue
            contrib = jnp.einsum("bic,ijct->bjt", d[la], mats[:, :, lb],
                                 preferred_element_type=jnp.int32)
            out = out.at[:, :, s, :].add(contrib)
    return out


def recombine_planes_numpy(planes) -> "tuple":
    """NumPy oracle for the in-kernel u64 recombination: returns (lo, hi)
    uint32 arrays from int32 planes [..., 8, N]."""
    import numpy as np

    planes = np.asarray(planes)
    acc = np.zeros(planes.shape[:-2] + planes.shape[-1:], np.uint64)
    for s in range(planes.shape[-2]):
        v = planes[..., s, :].astype(np.int64).astype(np.uint64)
        acc += v << np.uint64(8 * s)
    return (acc & np.uint64(0xFFFFFFFF)).astype(np.uint32), \
        (acc >> np.uint64(32)).astype(np.uint32)
