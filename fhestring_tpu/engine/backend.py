"""Evaluation backends for the string engine.

The string engine (engine/strings.py) is written once against a duck-typed
backend interface operating on tensors of encrypted u8 chars ("CT") and
encrypted 0/1 bits ("BT"); all shapes/indices are public (data-oblivious
control flow, mirroring the reference's invariant — SURVEY.md section 1).

Two implementations:

- ClearBackend: plain numpy uint8.  Used to test the engine's algorithmic
  parity against Python's str oracle quickly, and as the reference-semantics
  executable spec.
- FheBackend: real TFHE via RadixContext; every op lowers to batched PBS.

This split mirrors how the reference separates string algorithms
(src/server_key/) from the crypto (tfhe-rs), but makes the boundary
swappable."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..radix import NB, RadixContext
from ..shortint import Blocks, ShortintContext


# =============================================================================
# Clear (plaintext) backend
# =============================================================================

class ClearBackend:
    """numpy-uint8 semantics: the executable spec of the engine ops."""

    name = "clear"
    xp = np  # plaintext index math inside scan bodies

    # -- scan / dynamic indexing (engine sequential kernels) -----------------
    def scan(self, body, carry, xs: dict, length: int):
        """Run body(carry, x) for i in [0, length); x = {k: xs[k][i]}.
        Plain Python loop — the executable spec of the FHE lax.scan path."""
        for i in range(length):
            carry = body(carry, {k: v[i] for k, v in xs.items()})
        return carry

    def scan_out(self, body, carry, xs: dict, length: int):
        """Like scan, but body returns (carry, y); returns (carry, ys) with
        the per-step ys stacked along a new leading axis.  Keeps scan
        carries small: per-step products belong in ys, not in the carry."""
        ys = []
        for i in range(length):
            carry, y = body(carry, {k: v[i] for k, v in xs.items()})
            ys.append(y)
        return carry, np.stack(ys)

    def dynamic_slice(self, x, start, size: int, axis=0):
        start = int(np.clip(start, 0, x.shape[axis] - size))
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(start, start + size)
        return x[tuple(idx)]

    dynamic_slice_bits = dynamic_slice

    def dynamic_update_slice(self, x, upd, start, axis=0):
        start = int(np.clip(start, 0, x.shape[axis] - upd.shape[axis]))
        out = x.copy()
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(start, start + upd.shape[axis])
        out[tuple(idx)] = upd
        return out

    dynamic_update_slice_bits = dynamic_update_slice

    def select_pmask(self, mask, x, y):
        """Plaintext 0/1 mask select (public positions, no crypto cost)."""
        return np.where(np.asarray(mask) != 0, x, y).astype(np.uint8)

    select_pmask_bits = select_pmask

    def mul_pmask(self, x, mask):
        return (x * np.asarray(mask).astype(np.uint8)).astype(np.uint8)

    mul_pmask_bits = mul_pmask

    def trivial_bits_dyn(self, v):
        """Trivial bit encryption of a runtime-computed plaintext value."""
        return np.asarray(v, dtype=np.uint8) & np.uint8(1)

    def declare(self, x, degree: int, noise_var: float):
        """Fix static (degree, noise) metadata — identity on plaintext."""
        return x

    declare_bits = declare

    # -- constructors / structure ------------------------------------------
    def trivial_chars(self, values):
        return np.asarray(values, dtype=np.uint8)

    def trivial_bits(self, values):
        return np.asarray(values, dtype=np.uint8) & np.uint8(1)

    def shape(self, x):
        return x.shape

    def concat(self, xs, axis=0):
        return np.concatenate(xs, axis=axis)

    def stack(self, xs, axis=0):
        return np.stack(xs, axis=axis)

    def take(self, x, idx, axis=0):
        return np.take(x, idx, axis=axis)

    def reshape(self, x, shape):
        return x.reshape(shape)

    def reshape_bits(self, x, shape):
        return x.reshape(shape)

    def shape_bits(self, x):
        return x.shape

    def broadcast_to(self, x, shape):
        return np.broadcast_to(x, shape)

    def zeros_chars(self, shape):
        return np.zeros(shape, dtype=np.uint8)

    # -- char ops -------------------------------------------------------------
    def eq(self, x, y):
        return (x == y).astype(np.uint8)

    def ne(self, x, y):
        return (x != y).astype(np.uint8)

    def lt(self, x, y):
        return (x < y).astype(np.uint8)

    def le(self, x, y):
        return (x <= y).astype(np.uint8)

    def gt(self, x, y):
        return (x > y).astype(np.uint8)

    def ge(self, x, y):
        return (x >= y).astype(np.uint8)

    def select(self, c, x, y):
        return np.where(c != 0, x, y).astype(np.uint8)

    def mul_bit(self, x, b):
        return (x * b).astype(np.uint8)

    def add_chars(self, x, y):
        return (x.astype(np.int32) + y).astype(np.uint8)

    def sub_chars(self, x, y):
        return (x.astype(np.int32) - y).astype(np.uint8)

    def ne_zero(self, x):
        return (x != 0).astype(np.uint8)

    def eq_zero(self, x):
        return (x == 0).astype(np.uint8)

    def is_whitespace(self, x):
        return np.isin(x, [0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x20]).astype(np.uint8)

    def is_uppercase(self, x):
        return ((x >= 0x41) & (x <= 0x5A)).astype(np.uint8)

    def is_lowercase(self, x):
        return ((x >= 0x61) & (x <= 0x7A)).astype(np.uint8)

    def to_upper(self, x):
        return (x - 32 * self.is_lowercase(x)).astype(np.uint8)

    def to_lower(self, x):
        return (x + 32 * self.is_uppercase(x)).astype(np.uint8)

    # -- bit ops ---------------------------------------------------------------
    def and_(self, a, b):
        return (a & b).astype(np.uint8)

    def or_(self, a, b):
        return (a | b).astype(np.uint8)

    def not_(self, a):
        return (1 - a).astype(np.uint8)

    def any_axis(self, bits, axis):
        return bits.any(axis=axis).astype(np.uint8)

    def all_axis(self, bits, axis):
        return bits.all(axis=axis).astype(np.uint8)

    def cum_or(self, bits, axis, reverse=False, exclusive=False):
        b = bits
        if reverse:
            b = np.flip(b, axis=axis)
        out = np.maximum.accumulate(b, axis=axis)
        if exclusive:
            shifted = np.roll(out, 1, axis=axis)
            idx = [slice(None)] * out.ndim
            idx[axis] = 0
            shifted[tuple(idx)] = 0
            out = shifted
        if reverse:
            out = np.flip(out, axis=axis)
        return out.astype(np.uint8)

    def sum_bits(self, bits, axis):
        return bits.sum(axis=axis).astype(np.uint8)

    def cumsum_bits(self, bits, axis):
        """Inclusive prefix count of bits, as u8 chars."""
        return np.cumsum(bits, axis=axis).astype(np.uint8)

    def weighted_onehot_sum(self, onehot, weights, axis):
        """sum_i onehot_i * weights_i along axis; onehot has <= 1 set."""
        w = np.asarray(weights, dtype=np.uint8)
        shape = [1] * onehot.ndim
        shape[axis] = len(w)
        return (onehot * w.reshape(shape)).sum(axis=axis).astype(np.uint8)

    def sum_onehot_chars(self, chars, axis):
        """Sum chars along axis when at most one is nonzero."""
        return chars.sum(axis=axis, dtype=np.int32).astype(np.uint8)

    # -- linear (PBS-free in FHE) helpers for oblivious routing -------------
    def char_bit(self, x, k: int):
        """Bit k of a char value, as a bit tensor."""
        return ((x >> k) & 1).astype(np.uint8)

    def char_bits(self, x, nbits: int):
        """Bits 0..nbits-1 of a char value, stacked on a new leading axis."""
        ks = np.arange(nbits).reshape((nbits,) + (1,) * x.ndim)
        return ((x[None] >> ks) & 1).astype(np.uint8)

    def sub_exact(self, x, y):
        """x - y, valid when y's value is <= x's blockwise (e.g. y = x*m)."""
        return (x - y).astype(np.uint8)

    sub_exact_bits = sub_exact

    def add_nooverlap(self, x, y):
        """x + y when at most one is nonzero per slot (no carries)."""
        return (x + y).astype(np.uint8)

    add_nooverlap_bits = add_nooverlap


# =============================================================================
# FHE backend
# =============================================================================

class FheBackend:
    """Real TFHE: CT = Blocks [..., 4, kN+1], BT = Blocks [...]."""

    name = "fhe"
    xp = jnp  # plaintext index math inside scan bodies (traced)

    def __init__(self, rc: RadixContext):
        self.rc = rc
        self.sc: ShortintContext = rc.sc

    # -- scan / dynamic indexing (engine sequential kernels) -----------------
    def scan(self, body, carry, xs: dict, length: int):
        """One jax.lax.scan over the engine's sequential hot loops: the body
        (with all its PBS call sites) is traced/compiled ONCE for all
        `length` steps, replacing the reference's per-position unrolling
        (e.g. src/server_key/split.rs:940-985) — the round-1 compile/trace
        pathology fix."""
        import jax

        from .. import metrics

        xs_j = {k: jnp.asarray(v) for k, v in xs.items()}

        def step(c, x):
            return body(c, x), None

        with metrics.scan_scope(length):
            carry, _ = jax.lax.scan(step, carry, xs_j, length=length)
        return carry

    def scan_out(self, body, carry, xs: dict, length: int):
        """scan with stacked per-step outputs (lax.scan ys).  The body's y
        pytree (e.g. a Blocks scalar) must keep constant aux metadata across
        steps — use declare.  This is the key to small scan carries: the
        per-position products the engine used to dynamic_update_slice into
        an O(L^2) carried grid come back as ys instead, so the carry stays
        O(L) and the grid math runs as ONE post-scan batch."""
        import jax

        from .. import metrics

        xs_j = {k: jnp.asarray(v) for k, v in xs.items()}

        with metrics.scan_scope(length):
            carry, ys = jax.lax.scan(body, carry, xs_j, length=length)
        return carry, ys

    def _dyn_slice(self, x: Blocks, start, size: int, axis: int, tail: int):
        from ..torus import U64
        import jax

        ndim = x.ct.lo.ndim
        ax = axis if axis >= 0 else axis - tail
        if ax < 0:
            ax += ndim
        sizes = list(x.ct.lo.shape)
        sizes[ax] = size
        starts = [0] * ndim
        starts[ax] = start
        lo = jax.lax.dynamic_slice(x.ct.lo, starts, sizes)
        hi = jax.lax.dynamic_slice(x.ct.hi, starts, sizes)
        return Blocks(U64(lo, hi), x.degree, x.noise_var)

    def dynamic_slice(self, x: Blocks, start, size: int, axis=0):
        return self._dyn_slice(x, start, size, axis, tail=2)

    def dynamic_slice_bits(self, x: Blocks, start, size: int, axis=0):
        return self._dyn_slice(x, start, size, axis, tail=1)

    def _dyn_update(self, x: Blocks, upd: Blocks, start, axis: int, tail: int):
        from ..torus import U64
        import jax

        ndim = x.ct.lo.ndim
        ax = axis if axis >= 0 else axis - tail
        if ax < 0:
            ax += ndim
        starts = [0] * ndim
        starts[ax] = start
        lo = jax.lax.dynamic_update_slice(x.ct.lo, upd.ct.lo, starts)
        hi = jax.lax.dynamic_update_slice(x.ct.hi, upd.ct.hi, starts)
        return Blocks(U64(lo, hi), max(x.degree, upd.degree),
                      max(x.noise_var, upd.noise_var))

    def dynamic_update_slice(self, x: Blocks, upd: Blocks, start, axis=0):
        return self._dyn_update(x, upd, start, axis, tail=2)

    def dynamic_update_slice_bits(self, x: Blocks, upd: Blocks, start, axis=0):
        return self._dyn_update(x, upd, start, axis, tail=1)

    def _pmask_where(self, mask, x: Blocks, y: Blocks, tail: int):
        """Select by a PLAINTEXT 0/1 mask: pure torus-limb where, no PBS and
        no noise cost (the positions are public, the values stay encrypted)."""
        from ..torus import U64

        m = jnp.asarray(mask)
        m = m.reshape(m.shape + (1,) * tail) != 0
        lo = jnp.where(m, x.ct.lo, y.ct.lo)
        hi = jnp.where(m, x.ct.hi, y.ct.hi)
        return Blocks(U64(lo, hi), max(x.degree, y.degree),
                      max(x.noise_var, y.noise_var))

    def select_pmask(self, mask, x: Blocks, y: Blocks):
        return self._pmask_where(mask, x, y, tail=2)

    def select_pmask_bits(self, mask, x: Blocks, y: Blocks):
        return self._pmask_where(mask, x, y, tail=1)

    def mul_pmask(self, x: Blocks, mask):
        return self._mul_pmask(x, mask, tail=2)

    def mul_pmask_bits(self, x: Blocks, mask):
        return self._mul_pmask(x, mask, tail=1)

    def _mul_pmask(self, x: Blocks, mask, tail: int):
        from ..torus import U64

        m = jnp.asarray(mask)
        m = (m.reshape(m.shape + (1,) * tail) != 0)
        z = jnp.zeros_like(x.ct.lo)
        return Blocks(U64(jnp.where(m, x.ct.lo, z), jnp.where(m, x.ct.hi, z)),
                      x.degree, x.noise_var)

    def trivial_bits_dyn(self, v):
        """Trivial bit of a traced plaintext scalar/array: delta*v at the
        body coefficient (create_trivial_radix analog for runtime values)."""
        from ..torus import U64

        p = self.sc.params
        v = jnp.asarray(v)
        delta = int(p.delta)
        enc_lo = (v != 0).astype(jnp.uint32) * jnp.uint32(delta & 0xFFFFFFFF)
        enc_hi = (v != 0).astype(jnp.uint32) * jnp.uint32(delta >> 32)
        shape = v.shape + (p.big_lwe_dimension + 1,)
        lo = jnp.zeros(shape, jnp.uint32).at[..., -1].set(enc_lo)
        hi = jnp.zeros(shape, jnp.uint32).at[..., -1].set(enc_hi)
        return Blocks(U64(lo, hi), 1, 0.0)

    def declare(self, x: Blocks, degree: int, noise_var: float) -> Blocks:
        """Widen static (degree, noise) metadata to fixed scan-carry values.
        Sound because both only ever bound the true plaintext/noise."""
        assert x.degree <= degree and x.noise_var <= noise_var + 1e-9, (
            x.degree, x.noise_var, degree, noise_var)
        return Blocks(x.ct, degree, noise_var)

    declare_bits = declare

    # -- constructors / structure ------------------------------------------
    def trivial_chars(self, values):
        return self.rc.trivial_chars(np.asarray(values, dtype=np.uint64))

    def trivial_bits(self, values):
        return self.rc.trivial_bits(np.asarray(values, dtype=np.uint64))

    def shape(self, x: Blocks):
        """Batch shape of a CHAR tensor ([..., NB, kN+1]).

        Chars and bits are distinguished by call-site contract, never by
        shape sniffing: a bits tensor with a dimension equal to NB (e.g. a
        4-slot string buffer) is indistinguishable from a char tensor by
        shape alone. Use shape_bits for bit tensors.
        """
        return x.ct.lo.shape[:-2]

    def shape_bits(self, x: Blocks):
        """Batch shape of a BITS tensor ([..., kN+1])."""
        return x.ct.lo.shape[:-1]

    def _map(self, fn, *xs: Blocks) -> Blocks:
        from .. import torus
        cts = [x.ct for x in xs]
        out = fn(*cts)
        return Blocks(out, max(x.degree for x in xs), max(x.noise_var for x in xs))

    def concat(self, xs, axis=0):
        from .. import torus
        return self._map(lambda *cts: torus.concatenate(list(cts), axis=axis), *xs)

    def stack(self, xs, axis=0):
        from .. import torus
        ax = axis if axis >= 0 else None
        assert axis >= 0, "use non-negative axes for stack"
        return self._map(lambda *cts: torus.stack(list(cts), axis=axis), *xs)

    def take(self, x: Blocks, idx, axis=0):
        idx = np.asarray(idx)
        lo = jnp.take(x.ct.lo, idx, axis=axis)
        hi = jnp.take(x.ct.hi, idx, axis=axis)
        from ..torus import U64
        return Blocks(U64(lo, hi), x.degree, x.noise_var)

    def reshape(self, x: Blocks, shape):
        """Reshape the batch dims of a CHAR tensor (tail [NB, kN+1] kept)."""
        from .. import torus
        tail = x.ct.lo.shape[-2:]
        return Blocks(torus.reshape(x.ct, tuple(shape) + tail), x.degree, x.noise_var)

    def reshape_bits(self, x: Blocks, shape):
        """Reshape the batch dims of a BITS tensor (tail [kN+1] kept)."""
        from .. import torus
        tail = x.ct.lo.shape[-1:]
        return Blocks(torus.reshape(x.ct, tuple(shape) + tail), x.degree, x.noise_var)

    def broadcast_to(self, x: Blocks, shape):
        """Broadcast the batch dims of a CHAR tensor."""
        tail = x.ct.lo.shape[-2:]
        full = tuple(shape) + tail
        from ..torus import U64
        return Blocks(U64(jnp.broadcast_to(x.ct.lo, full),
                          jnp.broadcast_to(x.ct.hi, full)), x.degree, x.noise_var)

    def zeros_chars(self, shape):
        return self.trivial_chars(np.zeros(shape, dtype=np.uint64))

    # -- char ops ---------------------------------------------------------------
    def eq(self, x, y):
        return self.rc.eq(*self._align(x, y))

    def ne(self, x, y):
        return self.rc.ne(*self._align(x, y))

    def lt(self, x, y):
        return self.rc.lt(*self._align(x, y))

    def le(self, x, y):
        return self.rc.le(*self._align(x, y))

    def gt(self, x, y):
        return self.rc.gt(*self._align(x, y))

    def ge(self, x, y):
        return self.rc.ge(*self._align(x, y))

    def _align(self, x: Blocks, y: Blocks):
        """Broadcast two char tensors to a common batch shape."""
        sx, sy = self.shape(x), self.shape(y)
        common = np.broadcast_shapes(sx, sy)
        if sx != common:
            x = self.broadcast_to(x, common)
        if sy != common:
            y = self.broadcast_to(y, common)
        return x, y

    def _align_bit(self, c: Blocks, target_shape):
        sc = self.shape_bits(c)
        if tuple(sc) != tuple(target_shape):
            from ..torus import U64
            full = tuple(target_shape) + c.ct.lo.shape[-1:]
            c = Blocks(U64(jnp.broadcast_to(c.ct.lo, full),
                           jnp.broadcast_to(c.ct.hi, full)),
                       c.degree, c.noise_var)
        return c

    def select(self, c, x, y):
        x, y = self._align(x, y)
        c = self._align_bit(c, self.shape(x))
        return self.rc.select(c, x, y)

    def mul_bit(self, x, b):
        b = self._align_bit(b, self.shape(x))
        return self.rc.mul_bit(x, b)

    def add_chars(self, x, y):
        return self.rc.add_chars(*self._align(x, y))

    def sub_chars(self, x, y):
        return self.rc.sub_chars(*self._align(x, y))

    def ne_zero(self, x):
        return self.rc.ne_zero(x)

    def eq_zero(self, x):
        return self.rc.eq_zero(x)

    def is_whitespace(self, x):
        return self.rc.is_whitespace(x)

    def is_uppercase(self, x):
        return self.rc.is_uppercase(x)

    def is_lowercase(self, x):
        return self.rc.is_lowercase(x)

    def to_upper(self, x):
        return self.rc.to_upper_char(x)

    def to_lower(self, x):
        return self.rc.to_lower_char(x)

    # -- bit ops -----------------------------------------------------------------
    def and_(self, a, b):
        a, b = self._align_bits(a, b)
        return self.rc.and_(a, b)

    def or_(self, a, b):
        a, b = self._align_bits(a, b)
        return self.rc.or_(a, b)

    def _align_bits(self, a: Blocks, b: Blocks):
        sa, sb = a.ct.lo.shape[:-1], b.ct.lo.shape[:-1]
        common = np.broadcast_shapes(sa, sb)
        a = self._align_bit(a, common)
        b = self._align_bit(b, common)
        return a, b

    def not_(self, a):
        return self.rc.not_(a)

    def any_axis(self, bits, axis):
        return self.rc.any_axis(bits, axis)

    def all_axis(self, bits, axis):
        return self.rc.all_axis(bits, axis)

    def cum_or(self, bits: Blocks, axis, reverse=False, exclusive=False):
        """Hillis-Steele prefix OR scan (log-depth)."""
        n = bits.ct.lo.shape[axis if axis >= 0 else axis - 1]
        if axis < 0:
            axis = len(bits.ct.lo.shape) - 1 + axis
        cur = bits
        shift = 1
        while shift < n:
            from ..torus import U64
            lo = cur.ct.lo
            hi = cur.ct.hi
            if reverse:
                slo = jnp.concatenate([lo[_sl(axis, shift, None)],
                                       jnp.zeros_like(lo[_sl(axis, 0, shift)])], axis=axis)
                shi = jnp.concatenate([hi[_sl(axis, shift, None)],
                                       jnp.zeros_like(hi[_sl(axis, 0, shift)])], axis=axis)
            else:
                slo = jnp.concatenate([jnp.zeros_like(lo[_sl(axis, 0, shift)]),
                                       lo[_sl(axis, None, -shift)]], axis=axis)
                shi = jnp.concatenate([jnp.zeros_like(hi[_sl(axis, 0, shift)]),
                                       hi[_sl(axis, None, -shift)]], axis=axis)
            shifted = Blocks(U64(slo, shi), cur.degree, cur.noise_var)
            cur = self.rc.or_(cur, shifted)
            shift *= 2
        if exclusive:
            from ..torus import U64
            lo, hi = cur.ct.lo, cur.ct.hi
            if reverse:
                lo = jnp.concatenate([lo[_sl(axis, 1, None)],
                                      jnp.zeros_like(lo[_sl(axis, 0, 1)])], axis=axis)
                hi = jnp.concatenate([hi[_sl(axis, 1, None)],
                                      jnp.zeros_like(hi[_sl(axis, 0, 1)])], axis=axis)
            else:
                lo = jnp.concatenate([jnp.zeros_like(lo[_sl(axis, 0, 1)]),
                                      lo[_sl(axis, None, -1)]], axis=axis)
                hi = jnp.concatenate([jnp.zeros_like(hi[_sl(axis, 0, 1)]),
                                      hi[_sl(axis, None, -1)]], axis=axis)
            cur = Blocks(type(cur.ct)(lo, hi), cur.degree, cur.noise_var)
        return cur

    def sum_bits(self, bits, axis):
        return self.rc.sum_bits(bits, axis)

    def _cumsum_chars(self, chars: Blocks, axis: int) -> Blocks:
        """Inclusive prefix sum of chars, Hillis-Steele with radix adds
        (7 PBS/position/stage). axis indexes the RAW ct tensor."""
        from ..torus import U64
        n = chars.ct.lo.shape[axis]
        cur = chars
        shift = 1
        while shift < n:
            lo, hi = cur.ct.lo, cur.ct.hi
            zlo = jnp.zeros_like(lo[_sl(axis, 0, shift)])
            zhi = jnp.zeros_like(hi[_sl(axis, 0, shift)])
            slo = jnp.concatenate([zlo, lo[_sl(axis, None, -shift)]], axis=axis)
            shi = jnp.concatenate([zhi, hi[_sl(axis, None, -shift)]], axis=axis)
            shifted = Blocks(U64(slo, shi), cur.degree, cur.noise_var)
            cur = self.rc.add_chars(cur, shifted)
            shift *= 2
        return cur

    def cumsum_bits(self, bits: Blocks, axis):
        """Inclusive prefix count of bits, as u8 chars.

        Grouped carry-save scan, ~9.5 PBS/position instead of the naive
        7*log2(L) radix Hillis-Steele: within groups of up to 15 positions
        the inclusive prefixes are PURE LINEAR torus shift-adds (the sum
        lives in one block's message+carry space, degree <= 15); ONE LUT
        pair then extracts every in-group prefix to (mod 4, div 4) radix
        blocks; only the G = ceil(L/g) group totals pay the full radix
        Hillis-Steele, and a final radix add recombines base + in-group."""
        from .. import torus
        from ..torus import U64
        sc = self.sc
        nd = len(bits.ct.lo.shape)
        if axis < 0:
            axis = nd - 1 + axis
        # the in-group linear sums must stay in one block's value space
        # (degree*g <= 15) AND inside the noise budget at the extraction
        # LUT (noise*g <= budget); refresh noisy bits rather than flooring
        # the group size below what those bounds allow
        if bits.noise_var * 2 > sc.max_noise_var:
            bits = sc.apply_lut(bits, list(range(16)))  # value-preserving
        lo = jnp.moveaxis(bits.ct.lo, axis, -2)
        hi = jnp.moveaxis(bits.ct.hi, axis, -2)
        L = lo.shape[-2]
        g = max(2, min(15 // max(bits.degree, 1),
                       int(sc.max_noise_var //
                           max(bits.noise_var, 1e-9))))
        assert g * max(bits.degree, 1) <= 15, (g, bits.degree)
        G = -(-L // g)
        pad = G * g - L
        if pad:
            z = jnp.zeros(lo.shape[:-2] + (pad,) + lo.shape[-1:], lo.dtype)
            lo = jnp.concatenate([lo, z], axis=-2)
            hi = jnp.concatenate([hi, z], axis=-2)
        gs = lo.shape[:-2] + (G, g) + lo.shape[-1:]
        cur = U64(lo.reshape(gs), hi.reshape(gs))
        s = 1
        while s < g:  # in-group inclusive prefix: linear, zero PBS
            zlo = jnp.zeros_like(cur.lo[..., :s, :])
            slo = jnp.concatenate([zlo, cur.lo[..., :-s, :]], axis=-2)
            shi = jnp.concatenate([zlo, cur.hi[..., :-s, :]], axis=-2)
            cur = torus.add(cur, U64(slo, shi))
            s *= 2
        pref = Blocks(cur, min(15, max(1, bits.degree) * g),
                      bits.noise_var * g)
        # ONE multi-table batch extracts both radix blocks (mod 4, div 4)
        # of every in-group prefix — warm latency is dispatch-count-bound
        pref2 = Blocks(torus.stack([pref.ct, pref.ct], axis=0),
                       pref.degree, pref.noise_var)
        idx = jnp.broadcast_to(
            jnp.arange(2, dtype=jnp.int32).reshape(
                (2,) + (1,) * (len(gs) - 1)), (2,) + gs[:-1])
        both = sc.apply_lut_multi(
            pref2, ([v % 4 for v in range(16)], [v // 4 for v in range(16)]),
            idx)
        low = Blocks(U64(both.ct.lo[0], both.ct.hi[0]),
                     both.degree, both.noise_var)               # [.., G, g]
        high = Blocks(U64(both.ct.lo[1], both.ct.hi[1]),
                      both.degree, both.noise_var)
        zblk = sc.trivial(np.zeros(gs[:-1], np.uint64))
        ingroup = self.rc.from_blocks([low, high, zblk, zblk])  # chars
        if G > 1:
            # group totals = in-group prefix at position g-1, as chars
            tot_raw = U64(ingroup.ct.lo[..., g - 1, :, :],
                          ingroup.ct.hi[..., g - 1, :, :])
            tot = Blocks(tot_raw, ingroup.degree, ingroup.noise_var)
            inc = self._cumsum_chars(tot, axis=tot_raw.lo.ndim - 3)
            ax_g = inc.ct.lo.ndim - 3
            zlo = jnp.zeros_like(inc.ct.lo[_sl(ax_g, 0, 1)])
            base = Blocks(U64(
                jnp.concatenate([zlo, inc.ct.lo[_sl(ax_g, None, -1)]],
                                axis=ax_g),
                jnp.concatenate([zlo, inc.ct.hi[_sl(ax_g, None, -1)]],
                                axis=ax_g)), inc.degree, inc.noise_var)
            bexp = Blocks(U64(
                jnp.broadcast_to(base.ct.lo[..., :, None, :, :],
                                 ingroup.ct.lo.shape),
                jnp.broadcast_to(base.ct.hi[..., :, None, :, :],
                                 ingroup.ct.hi.shape)),
                base.degree, base.noise_var)
            out = self.rc.add_chars(ingroup, bexp)
        else:
            out = ingroup
        flat_shape = out.ct.lo.shape[:-4] + (G * g,) + out.ct.lo.shape[-2:]
        olo = out.ct.lo.reshape(flat_shape)[..., :L, :, :]
        ohi = out.ct.hi.reshape(flat_shape)[..., :L, :, :]
        olo = jnp.moveaxis(olo, -3, axis)
        ohi = jnp.moveaxis(ohi, -3, axis)
        return Blocks(U64(olo, ohi), out.degree, out.noise_var)

    def weighted_onehot_sum(self, onehot: Blocks, weights, axis):
        """sum_i onehot_i * w_i via per-bitplane ORs (no noise blowup)."""
        from .. import torus
        w = np.asarray(weights, dtype=np.uint64)
        if axis < 0:
            axis = len(onehot.ct.lo.shape) - 1 + axis
        blocks = []
        for b in range(NB):
            wb = ((w >> (2 * b)) & 3).astype(np.int64)
            parts = []
            for bitpos, bitval in ((0, 1), (1, 2)):
                cols = np.nonzero((wb >> bitpos) & 1)[0]
                if len(cols) == 0:
                    continue
                sub = self.take(onehot, cols, axis=axis)
                anyb = self.rc.any_axis(sub, axis)
                parts.append(self.sc.scalar_mul(anyb, bitval))
            if not parts:
                shape = onehot.ct.lo.shape[:axis] + onehot.ct.lo.shape[axis + 1:-1]
                blocks.append(self.sc.trivial(np.zeros(shape, np.uint64)))
            elif len(parts) == 1:
                blocks.append(parts[0])
            else:
                blocks.append(self.sc.add(parts[0], parts[1]))
        return self.rc.from_blocks(blocks)

    def sum_onehot_chars(self, chars: Blocks, axis):
        """Sum chars along axis when at most one is nonzero: grouped linear
        sums with refresh bootstraps to bound noise."""
        from .. import torus
        if axis < 0:
            axis = len(self.shape(chars)) + axis
        cur = chars
        while cur.ct.lo.shape[axis] > 1:
            n = cur.ct.lo.shape[axis]
            g = max(2, min(n, int(self.sc.max_noise_var // max(cur.noise_var, 1e-9))))
            pad = (-n) % g
            ct = cur.ct
            if pad:
                zshape = list(ct.lo.shape)
                zshape[axis] = pad
                z = jnp.zeros(zshape, jnp.uint32)
                ct = type(ct)(jnp.concatenate([ct.lo, z], axis=axis),
                              jnp.concatenate([ct.hi, z], axis=axis))
            shape = list(ct.lo.shape)
            shape[axis:axis + 1] = [shape[axis] // g, g]
            summed = torus.sum_axis(torus.reshape(ct, shape), axis + 1)
            cur = Blocks(summed, 3, cur.noise_var * g)
            if cur.noise_var * 16 + 2 > self.sc.max_noise_var and cur.ct.lo.shape[axis] > 1:
                cur = self.sc.apply_lut(cur, list(range(4)) * 4)
        from ..torus import U64
        lo = jnp.squeeze(cur.ct.lo, axis=axis)
        hi = jnp.squeeze(cur.ct.hi, axis=axis)
        out = Blocks(U64(lo, hi), 3, cur.noise_var)
        if out.noise_var * 16 + 2 > self.sc.max_noise_var:
            out = self.sc.apply_lut(out, list(range(4)) * 4)
        return out

    # -- linear (PBS-free) helpers for oblivious routing ---------------------
    def char_bit(self, x: Blocks, k: int) -> Blocks:
        """Bit k of a char value as an encrypted bit: ONE LUT on block k//2
        (each 2-bit radix block holds bits 2j, 2j+1)."""
        blk = self.rc.block(x, k // 2)
        tab = [(v >> (k % 2)) & 1 if v < 4 else 0 for v in range(16)]
        return self.sc.apply_lut(blk, tab)

    def char_bits(self, x: Blocks, nbits: int) -> Blocks:
        """Bits 0..nbits-1 stacked on a new leading axis, in ONE PBS batch:
        gather each bit's source block, then a multi-table LUT selecting
        the even/odd bit table per plane."""
        from .. import torus
        blks = [self.rc.block(x, k // 2) for k in range(nbits)]
        stacked = Blocks(torus.stack([b.ct for b in blks], axis=0),
                         max(b.degree for b in blks),
                         max(b.noise_var for b in blks))
        tabs = ([(v & 1) if v < 4 else 0 for v in range(16)],
                [((v >> 1) & 1) if v < 4 else 0 for v in range(16)])
        idx = jnp.broadcast_to(
            jnp.arange(nbits, dtype=jnp.int32).reshape(
                (nbits,) + (1,) * (stacked.ct.lo.ndim - 2)) % 2,
            stacked.ct.lo.shape[:-1])
        return self.sc.apply_lut_multi(stacked, tabs, idx)

    def sub_exact(self, x: Blocks, y: Blocks) -> Blocks:
        """x - y when y's blocks are each <= x's blocks (e.g. y = mul_bit(
        x, m), so per-block the difference is x_b*(1-m) >= 0): pure torus
        subtraction — zero PBS, noise adds."""
        from .. import torus
        return Blocks(torus.sub(x.ct, y.ct), x.degree,
                      x.noise_var + y.noise_var)

    sub_exact_bits = sub_exact

    def add_nooverlap(self, x: Blocks, y: Blocks) -> Blocks:
        """x + y when at most one operand is nonzero per slot (oblivious
        routing invariant): pure torus add — zero PBS, no carries needed."""
        from .. import torus
        return Blocks(torus.add(x.ct, y.ct), max(x.degree, y.degree),
                      x.noise_var + y.noise_var)

    add_nooverlap_bits = add_nooverlap


def _sl(axis, start, stop):
    """Build a slice tuple selecting [start:stop] along `axis`."""
    idx = [slice(None)] * (axis + 1)
    idx[axis] = slice(start, stop)
    return tuple(idx)
