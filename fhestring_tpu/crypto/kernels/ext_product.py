"""Pallas TPU kernel for the blind-rotation external product.

This is the speed-of-light core of the PBS (BASELINE.json north star): per
blind-rotation step, the decomposed accumulator digits (int8 limb planes)
multiply the step's bootstrap-key polynomials in the negacyclic ring
Z_{2^64}[X]/(X^N+1).  The product is evaluated exactly as int8 x int8 ->
int32 matmuls on the MXU:

    out[b, jout, s, t] = sum_{la+lb=s} sum_{i, c}
        D_la[b, i, c] * limb_lb(BSK[j][i, jout])[(t - c) mod± N]

Key ideas:
- The virtual negacyclic matrices of the key polynomials are never
  materialized in HBM.  Each 128-column panel is generated in VMEM as a
  Hankel strip via a 7-stage lane-shear (pltpu.roll + iota select), costing
  ~7 VPU ops per generated element, amortized over all batch tiles.
- The batch axis B (string positions x blocks) is streamed through VMEM
  with double-buffered DMA; it is the MXU-saturation axis.
- Digit limb planes (la) and key limb planes (lb) combine into 8 output
  shift planes s (s >= 8 wraps past 2^64 and is dropped), recombined into
  u64 limbs by the caller.

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


def _gen_hankel_strip(w, n_poly: int):
    """w: int8 [N+LANE] window of the doubled poly.  Returns the Hankel
    strip R[c', dt] = w[c' + dt] as int8 [N, LANE] via log-shear."""
    ext = n_poly + LANE
    # Mosaic only supports minor-dim-inserting broadcasts for 32-bit types;
    # shear in int32 and cast back (strip gen is a few % of kernel time).
    m = jnp.broadcast_to(w.astype(jnp.int32)[:, None], (ext, LANE))
    lane = jax.lax.broadcasted_iota(jnp.int32, (ext, LANE), 1)
    for k in range(7):  # shifts up to 127
        # shift-up by 2^k == positive circular roll by ext - 2^k
        rolled = pltpu.roll(m, ext - (1 << k), 0)
        bit = ((lane >> k) & 1) == 1
        m = jnp.where(bit, rolled, m)
    # one extra shift-up: rows must start at w[1] (the window base is kept
    # 128-aligned for Mosaic; the true Hankel origin is base+1)
    m = pltpu.roll(m, ext - 1, 0)
    return m[:n_poly, :].astype(jnp.int8)


def _ext_product_kernel(drev_hbm, p4_ref, out_hbm, r_all, dtile, otile,
                        dma_sems, out_sem, *, n_poly: int, b_tile: int,
                        num_la: int, kp1: int, ablate: str = ""):
    """grid = (T_panels, kp1); see module docstring for the contraction."""
    t_idx = pl.program_id(0)
    t0 = t_idx * LANE
    two_n = 2 * n_poly

    # ---- generate Hankel strips for this (t-panel, jout) ----
    # R_all[lb, i*N:(i+1)*N, :]: R[c',dt] = p2[(t0 + dt - N + 1 + c') mod 2N].
    # The window starts at the 128-aligned (t0 - N) mod 2N; the +1 is applied
    # as a final row shift inside _gen_hankel_strip.
    t_panels = n_poly // LANE
    base_panel = (t_idx + t_panels) % (2 * t_panels)
    base = pl.multiple_of(base_panel * LANE, LANE)
    del two_n
    if "gen" not in ablate:
        for i in range(kp1):
            for lb in range(NUM_LB):
                w = p4_ref[i, 0, lb, pl.ds(base, n_poly + LANE)]
                r_all[lb, i * n_poly:(i + 1) * n_poly, :] = _gen_hankel_strip(
                    w, n_poly)

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

        # One dot per key-limb plane with all digit-limb planes folded into
        # the M dimension (3x fewer MXU weight loads than per-(la,lb) dots).
        if "dot" not in ablate:
            dcat = dtile[slot].reshape(num_la * b_tile, dtile.shape[-1])
            acc = [jnp.zeros((b_tile, LANE), jnp.int32) for _ in range(NUM_LB)]
            for lb in range(NUM_LB):
                r = jax.lax.dot(dcat, r_all[lb],
                                preferred_element_type=jnp.int32)
                for la in range(num_la):
                    s = la + lb
                    if s >= NUM_LB:
                        continue
                    acc[s] = acc[s] + r[la * b_tile:(la + 1) * b_tile]
            for s in range(NUM_LB):
                otile[:, s, :] = acc[s]

        if "out" not in ablate:
            copy_out = pltpu.make_async_copy(
                otile,
                out_hbm.at[pl.ds(bi * b_tile, b_tile), pl.program_id(1),
                           slice(None), pl.ds(t0, LANE)],
                out_sem,
            )
            copy_out.start()
            copy_out.wait()
        return 0

    jax.lax.fori_loop(0, num_b_tiles, body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("n_poly", "b_tile", "interpret",
                                              "ablate"))
def ext_product_planes(drev: jnp.ndarray, p4: jnp.ndarray, *,
                       n_poly: int, b_tile: int = 128,
                       interpret: bool = False, ablate: str = "") -> jnp.ndarray:
    """Pallas entry: drev int8 [num_la, B, (k+1)*N] (digit limbs with the
    c-axis REVERSED within each i-block), p4 int8 [k+1, k+1, 8, 4N]
    (quadrupled key limb planes, [i, jout, lb]).

    Returns int32 planes [B, k+1, 8, N]."""
    num_la, B, kn = drev.shape
    kp1 = p4.shape[0]
    assert kn == kp1 * n_poly
    assert B % b_tile == 0, (B, b_tile)
    t_panels = n_poly // LANE

    grid = (t_panels, kp1)
    out = pl.pallas_call(
        functools.partial(_ext_product_kernel, n_poly=n_poly, b_tile=b_tile,
                          num_la=num_la, kp1=kp1, ablate=ablate),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # drev stays in HBM
            pl.BlockSpec((kp1, 1, NUM_LB, 4 * n_poly),
                         lambda t, j: (0, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((B, kp1, NUM_LB, n_poly), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((NUM_LB, kp1 * n_poly, LANE), jnp.int8),   # strips
            pltpu.VMEM((2, num_la, b_tile, kp1 * n_poly), jnp.int8),  # D dbuf
            pltpu.VMEM((b_tile, NUM_LB, LANE), jnp.int32),        # out tile
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(drev, p4)
    return out


def ext_product_planes_reference(drev: jnp.ndarray, p4: jnp.ndarray, *,
                                 n_poly: int) -> jnp.ndarray:
    """jnp reference with identical semantics (for CPU tests / parity)."""
    num_la, B, kn = drev.shape
    kp1 = p4.shape[0]
    two_n = 2 * n_poly
    t = jnp.arange(n_poly)
    # strips: R[i, jout, lb, c', t] = p2[(t - (N-1-c')) mod 2N]
    cprime = jnp.arange(n_poly)
    idx = (t[None, :] - (n_poly - 1 - cprime)[:, None]) % two_n  # [N, N]
    p2 = p4[..., :two_n]
    mats = p2[:, :, :, idx]  # [i, jout, lb, c', t]
    out = jnp.zeros((B, kp1, NUM_LB, n_poly), jnp.int32)
    d = drev.reshape(num_la, B, kp1, n_poly)
    for s in range(NUM_LB):
        for la in range(num_la):
            lb = s - la
            if lb < 0 or lb >= NUM_LB:
                continue
            contrib = jnp.einsum("bic,ijct->bjt", d[la], mats[:, :, lb],
                                 preferred_element_type=jnp.int32)
            out = out.at[:, :, s, :].add(contrib)
    return out
