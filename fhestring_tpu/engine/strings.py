"""The string VM: every reference method, vectorized and data-oblivious.

Re-implements the full algorithm surface of the reference's
src/server_key/{mod.rs,split.rs,trim.rs} (SURVEY.md section 2.2) over the
swappable backend, replacing the reference's scalar per-position loops with
batched tensor ops feeding wide PBS batches:

- position loops  -> window gathers + all/any reductions
- select chains   -> last/first-match one-hots + weighted one-hot sums
- bubble_zeroes_right (O(n^2) cmux, reference utils.rs:28-46)
                  -> rank-and-route oblivious stable compaction
- latch flags     -> prefix/suffix OR scans

Semantics (padding rules, 255 not-found sentinel, fixed split buffer grids,
replacen counters, overlap masks — including the reference's quirks) match
the reference exactly; every method cites its reference lines.

Engine values are raw backend tensors; the typed API lives in server.py.
"""

from __future__ import annotations

import numpy as np

MAX_FIND_LENGTH = 255  # reference src/main.rs:20
MAX_REPETITIONS = 16   # reference src/main.rs:14-17


class StringEngine:
    def __init__(self, backend):
        self.b = backend

    # ------------------------------------------------------------------
    # small helpers
    # ------------------------------------------------------------------
    def _windows(self, s, count: int, m: int):
        """Gather all windows s[i:i+m] for i in [0, count) -> CT [count, m]."""
        idx = np.arange(count)[:, None] + np.arange(m)[None, :]
        return self.b.take(s, idx, axis=0)

    def _first_onehot(self, bits, axis=0):
        b = self.b
        seen = b.cum_or(bits, axis=axis, exclusive=True)
        return b.and_(bits, b.not_(seen))

    def _last_onehot(self, bits, axis=0):
        b = self.b
        seen = b.cum_or(bits, axis=axis, reverse=True, exclusive=True)
        return b.and_(bits, b.not_(seen))

    def _position_value(self, onehot, weights, default: int):
        """Encrypted value = weights[i] where onehot_i == 1, else default."""
        b = self.b
        miss = b.not_(b.any_axis(onehot, 0))
        ext = b.concat([onehot, b.reshape_bits(miss, (1,))], axis=0)
        w = np.concatenate([np.asarray(weights, np.uint8), [default]])
        return b.weighted_onehot_sum(ext, w, axis=0)

    def _bit_to_char(self, bit):
        """Promote an encrypted bit to a full u8 char value (0/1) — the
        reference returns predicates as FheAsciiChar radix values."""
        return self.b.mul_bit(self.b.trivial_chars(np.uint8(1)), bit)

    def compact_zeros_right(self, s):
        """Stable move of all NUL chars to the right: value-identical to the
        reference's bubble_zeroes_right (utils.rs:28-46) but O(L^2) batched
        comparisons at O(log L) depth instead of O(L^2) sequential cmux."""
        b = self.b
        L = b.shape(s)[0]
        if L <= 1:
            return s
        nz = b.ne_zero(s)                      # [L]
        rank = b.cumsum_bits(nz, 0)            # [L] inclusive counts
        rank2 = b.reshape(rank, (L, 1))
        targets = b.trivial_chars(np.arange(1, L + 1, dtype=np.uint8).reshape(1, L))
        onehot = b.eq(rank2, targets)          # [L, L]: rank_i == j+1
        masked = b.and_(onehot, b.reshape_bits(nz, (L, 1)))
        vals = b.mul_bit(b.broadcast_to(b.reshape(s, (L, 1)), (L, L)), masked)
        return b.sum_onehot_chars(vals, axis=0)

    # ------------------------------------------------------------------
    # predicates (reference src/server_key/mod.rs)
    # ------------------------------------------------------------------
    def contains(self, s, pat):
        """mod.rs:151-182."""
        b = self.b
        L, m = b.shape(s)[0], b.shape(pat)[0]
        if L == 0 and m == 0:
            return b.trivial_bits(1)
        if m > L:
            return b.trivial_bits(0)
        W = L - m + 1
        if m == 0:
            return b.trivial_bits(1)
        wins = self._windows(s, W, m)                # [W, m]
        eqs = b.eq(wins, b.reshape(pat, (1, m)))     # [W, m]
        match = b.all_axis(eqs, 1)                   # [W]
        return b.any_axis(match, 0)

    def ends_with(self, s, pat):
        """mod.rs:241-281: last all-non-NUL window wins."""
        b = self.b
        L, m = b.shape(s)[0], b.shape(pat)[0]
        if L == 0 and m == 0:
            return b.trivial_bits(1)
        if m > L:
            return b.trivial_bits(0)
        W = L - m + 1
        wins = self._windows(s, W, m)
        if m == 0:
            cur = b.trivial_bits(np.ones(W, np.uint8))
            valid = b.trivial_bits(np.ones(W, np.uint8))
        else:
            eqs = b.eq(wins, b.reshape(pat, (1, m)))
            cur = b.all_axis(eqs, 1)
            valid = b.all_axis(b.ne_zero(wins), 1)
        onehot = self._last_onehot(valid, 0)
        return b.any_axis(b.and_(cur, onehot), 0)

    def starts_with(self, s, pat):
        """mod.rs:344-369."""
        b = self.b
        L, m = b.shape(s)[0], b.shape(pat)[0]
        if m > L:
            return b.trivial_bits(0)
        if L == 0:
            return b.trivial_bits(1 if m == 0 else 0)
        end = min(m, L)
        if end == 0:
            return b.trivial_bits(1)
        eqs = b.eq(self.b.take(s, np.arange(end), axis=0),
                   b.take(pat, np.arange(end), axis=0))
        return b.all_axis(eqs, 0)

    def is_empty(self, s):
        """mod.rs:431-451."""
        b = self.b
        if b.shape(s)[0] == 0:
            return b.trivial_bits(1)
        return b.all_axis(b.eq_zero(s), 0)

    def len(self, s):
        """mod.rs:478-493: encrypted count of non-NUL chars."""
        b = self.b
        if b.shape(s)[0] == 0:
            return b.trivial_chars(np.uint8(0))
        return b.sum_bits(b.ne_zero(s), 0)

    # ------------------------------------------------------------------
    # search (find / rfind), mod.rs:727-790, 1010-1053
    # ------------------------------------------------------------------
    def find(self, s, pat):
        b = self.b
        L, m = b.shape(s)[0], b.shape(pat)[0]
        if L == 0 and m == 0:
            return b.trivial_chars(np.uint8(0))
        if L >= MAX_FIND_LENGTH + m:
            raise ValueError("Maximum supported size for find reached")
        if m > L:
            return b.trivial_chars(np.uint8(255))
        W = L - m + 1
        if m == 0:
            match = b.trivial_bits(np.ones(W, np.uint8))
        else:
            wins = self._windows(s, W, m)
            match = b.all_axis(b.eq(wins, b.reshape(pat, (1, m))), 1)
        onehot = self._first_onehot(match, 0)
        return self._position_value(onehot, np.arange(W), MAX_FIND_LENGTH)

    def rfind(self, s, pat):
        b = self.b
        zero = b.trivial_chars(np.zeros(1, np.uint8))
        s = b.concat([s, zero], axis=0)  # "quick fix" push, mod.rs:737
        L, m = b.shape(s)[0], b.shape(pat)[0]
        if L >= MAX_FIND_LENGTH + m:
            raise ValueError("Maximum supported size for find reached")
        if m == 0:
            # last non-NUL position + 1 (mod.rs:747-760)
            nz = b.ne_zero(s)
            onehot = self._last_onehot(nz, 0)
            return self._position_value(onehot, np.arange(1, L + 1), 0)
        if m > L:
            return b.trivial_chars(np.uint8(255))
        W = max(L - m, 1)  # adjust_end_of_pattern, exclusive (mod.rs:768-771)
        wins = self._windows(s, W, m)
        match = b.all_axis(b.eq(wins, b.reshape(pat, (1, m))), 1)
        onehot = self._last_onehot(match, 0)
        return self._position_value(onehot, np.arange(W), MAX_FIND_LENGTH)

    # ------------------------------------------------------------------
    # whole-string equality & ordering, mod.rs:1122-1231, 1470-1692
    # ------------------------------------------------------------------
    def eq_strings(self, s, t):
        b = self.b
        L1, L2 = b.shape(s)[0], b.shape(t)[0]
        ml = min(L1, L2)
        len_ne = self.b.ne(self.len(s), self.len(t))
        if ml == 0:
            is_eq = b.trivial_bits(1)
        else:
            ss = b.take(s, np.arange(ml), axis=0)
            tt = b.take(t, np.arange(ml), axis=0)
            chars_eq = b.eq(ss, tt)
            both_zero = b.and_(b.eq_zero(ss), b.eq_zero(tt))
            is_eq = b.all_axis(b.or_(both_zero, chars_eq), 0)
        return b.and_(b.not_(len_ne), is_eq)

    def ne_strings(self, s, t):
        return self.b.not_(self.eq_strings(s, t))

    def eq_ignore_case(self, s, t):
        return self.eq_strings(self.to_lower(s), self.to_lower(t))

    def compare(self, s, t, op: str):
        """Lexicographic-ish comparison, mod.rs:1470-1541 semantics:
        first differing position decides; all-equal prefixes fall back to a
        length comparison."""
        b = self.b
        zero = b.trivial_chars(np.zeros(1, np.uint8))
        if min(b.shape(s)[0], b.shape(t)[0]) == 0:
            s = b.concat([s, zero], axis=0)
            t = b.concat([t, zero], axis=0)
        ml = min(b.shape(s)[0], b.shape(t)[0])
        ss = b.take(s, np.arange(ml), axis=0)
        tt = b.take(t, np.arange(ml), axis=0)
        cmp_fn = {"lt": b.lt, "le": b.le, "gt": b.gt, "ge": b.ge}[op]
        cmp_bits = cmp_fn(ss, tt)
        diff = b.ne(ss, tt)
        onehot = self._first_onehot(diff, 0)
        decided = b.any_axis(b.and_(onehot, cmp_bits), 0)
        any_diff = b.any_axis(diff, 0)
        len1, len2 = self.len(s), self.len(t)
        length_based = {
            "ge": b.or_(b.eq(len1, len2), b.gt(len1, len2)),
            "le": b.or_(b.eq(len1, len2), b.lt(len1, len2)),
            "gt": b.gt(len1, len2),
            "lt": b.lt(len1, len2),
        }[op]
        # any_diff ? decided : length_based   (bits)
        return b.or_(b.and_(any_diff, decided),
                     b.and_(b.not_(any_diff), length_based))

    # ------------------------------------------------------------------
    # rewriting, mod.rs:65-128, 517-591, 1864-1875; trim.rs
    # ------------------------------------------------------------------
    def to_upper(self, s):
        return self.b.to_upper(s) if self.b.shape(s)[0] else s

    def to_lower(self, s):
        return self.b.to_lower(s) if self.b.shape(s)[0] else s

    def concatenate(self, s, t):
        return self.compact_zeros_right(self.b.concat([s, t], axis=0))

    def repeat_clear(self, s, n: int):
        b = self.b
        if n == 0:
            return b.trivial_chars(np.zeros(0, np.uint8))
        return self.compact_zeros_right(b.concat([s] * n, axis=0))

    def repeat(self, s, n_enc):
        """mod.rs:567-591: MAX_REPETITIONS slots gated by i < n."""
        b = self.b
        L = b.shape(s)[0]
        slots = np.arange(MAX_REPETITIONS, dtype=np.uint8)
        flags = b.lt(b.trivial_chars(slots), n_enc)  # broadcasts () -> [16]
        grid = b.broadcast_to(b.reshape(s, (1, L)), (MAX_REPETITIONS, L))
        gated = b.mul_bit(grid, b.reshape_bits(flags, (MAX_REPETITIONS, 1)))
        flat = b.reshape(gated, (MAX_REPETITIONS * L,))
        return self.compact_zeros_right(flat)

    def trim_end(self, s):
        """trim.rs:36-57: suffix latch — keep chars from the last
        non-whitespace non-NUL onward."""
        b = self.b
        keep = b.and_(b.not_(b.is_whitespace(s)), b.ne_zero(s))
        stop = b.cum_or(keep, 0, reverse=True)
        return b.mul_bit(s, stop)

    def trim_start(self, s):
        """trim.rs:86-115 (prefix latch + compaction)."""
        b = self.b
        keep = b.and_(b.not_(b.is_whitespace(s)), b.ne_zero(s))
        stop = b.cum_or(keep, 0)
        return self.compact_zeros_right(b.mul_bit(s, stop))

    def trim(self, s):
        return self.trim_start(self.trim_end(s))

    # ------------------------------------------------------------------
    # strip_prefix / strip_suffix, mod.rs:1261-1396
    # ------------------------------------------------------------------
    def strip_prefix(self, s, pat):
        b = self.b
        L, m = b.shape(s)[0], b.shape(pat)[0]
        if m > L:
            return s, b.trivial_bits(0)
        if min(m, L) == 0:
            flag = b.trivial_bits(1 if m == 0 else 0)  # mod.rs:1279-1289
        else:
            flag = b.all_axis(
                b.eq(b.take(s, np.arange(m), axis=0), pat), 0)
        if m > 0:
            head = b.take(s, np.arange(m), axis=0)
            head = b.mul_bit(head, b.not_(flag))
            s = b.concat([head, b.take(s, np.arange(m, L), axis=0)], axis=0)
        return self.compact_zeros_right(s), flag

    def strip_suffix(self, s, pat):
        b = self.b
        L, m = b.shape(s)[0], b.shape(pat)[0]
        if m > L:
            return s, b.trivial_bits(0)
        W = L - m + 1
        wins = self._windows(s, W, m)
        if m == 0:
            found = b.trivial_bits(np.ones(W, np.uint8))
            valid = b.trivial_bits(np.ones(W, np.uint8))
        else:
            found = b.all_axis(b.eq(wins, b.reshape(pat, (1, m))), 1)
            valid = b.all_axis(b.ne_zero(wins), 1)
        last_valid = self._last_onehot(valid, 0)
        c = b.and_(last_valid, found)  # one-hot of the stripped window
        should = b.any_axis(c, 0)
        if m > 0:
            # zero out the window where c fires (mod.rs:1380-1390)
            mask_cols = []
            for p in range(L):
                lo = max(0, p - m + 1)
                hi = min(W - 1, p)
                if lo > hi:
                    mask_cols.append(None)
                else:
                    idx = np.arange(lo, hi + 1)
                    mask_cols.append(b.any_axis(b.take(c, idx, axis=0), 0))
            keep_bits = [b.not_(mc) if mc is not None else b.trivial_bits(1)
                         for mc in mask_cols]
            keep = b.stack(keep_bits, axis=0)
            s = b.mul_bit(s, keep)
        return s, should

    # ------------------------------------------------------------------
    # replace / replacen, mod.rs:624-697, 828-980, 1729-1830
    # ------------------------------------------------------------------
    def replace(self, s, frm, to, n_enc=None):
        """Dispatch on public pattern lengths (mod.rs:632-652)."""
        m_from = self.b.shape(frm)[0]
        m_to = self.b.shape(to)[0]
        if m_from >= m_to:
            return self._handle_longer_from(s, frm, to, n_enc)
        return self._handle_shorter_from(s, frm, to, n_enc)

    def _handle_longer_from(self, s, frm, to, n_enc):
        """from.len >= to.len (mod.rs:828-882): match on the ORIGINAL buffer,
        overwrite windows with zero-padded `to`, compact."""
        b = self.b
        zero = b.trivial_chars(np.zeros(1, np.uint8))
        s = b.concat([s, zero], axis=0)  # push, mod.rs:841
        L = b.shape(s)[0]
        f, t = b.shape(frm)[0], b.shape(to)[0]
        to_padded = b.concat([to, b.trivial_chars(np.zeros(f - t, np.uint8))],
                             axis=0) if f > t else to
        result = s
        if f <= L:
            W = max(L - f, 1)  # adjust_end_of_pattern, exclusive (mod.rs:856-859)
            if f == 0:
                flags = b.trivial_bits(np.ones(W, np.uint8))
            else:
                wins = self._windows(s, W, f)
                flags = b.all_axis(b.eq(wins, b.reshape(frm, (1, f))), 1)
            if n_enc is not None:
                counters = b.cumsum_bits(flags, 0)          # inclusive
                keep = b.ge(n_enc, counters)                # n >= counter
                flags = b.and_(flags, keep)
            # sequential writes result[i+k] = flag_i ? to[k] : ..., i ascending.
            # per output position the LAST firing i wins; resolve per diagonal
            # d = k descending (equals ascending i for fixed position).
            for d in range(f - 1, -1, -1):
                # positions p = i + d for i in [0, W)
                cols = np.arange(W) + d
                valid = cols < L
                cols = cols[valid]
                if len(cols) == 0:
                    continue
                flag_sel = b.take(flags, np.nonzero(valid)[0], axis=0)
                to_d = b.take(to_padded, np.full(len(cols), d), axis=0)
                cur = b.take(result, cols, axis=0)
                new = b.select(flag_sel, to_d, cur)
                result = self._scatter_positions(result, cols, new)
        return self.compact_zeros_right(result)

    def _scatter_positions(self, s, positions, new_vals):
        """Rebuild s with new values at the given (static) positions."""
        b = self.b
        L = b.shape(s)[0]
        pos_map = {int(p): i for i, p in enumerate(positions)}
        parts = []
        for p in range(L):
            if p in pos_map:
                parts.append(b.take(new_vals, np.array([pos_map[p]]), axis=0))
            else:
                parts.append(b.take(s, np.array([p]), axis=0))
        return b.concat(parts, axis=0)

    def _handle_shorter_from(self, s, frm, to, n_enc):
        """from.len < to.len (mod.rs:885-980): inherently sequential —
        matches test the mutated buffer; each step shifts the tail by the
        size difference through a snapshot."""
        b = self.b
        zero1 = b.trivial_chars(np.zeros(1, np.uint8))
        s = b.concat([s, zero1], axis=0)  # push, mod.rs:898
        L = b.shape(s)[0]
        f, t = b.shape(frm)[0], b.shape(to)[0]
        size_diff = t - f
        max_out = t * L + L if f > 0 else (L + (L + 1) * t) + 1  # mod.rs:903-914
        result = b.concat(
            [s, b.trivial_chars(np.zeros(max_out - L, np.uint8))], axis=0)
        ignore = [b.trivial_bits(1) for _ in range(max_out)]
        counter = b.trivial_chars(np.uint8(0))
        one_bit = b.trivial_bits(1)
        zero_bit = b.trivial_bits(0)

        for i in range(max_out - t):
            if f == 0:
                flag = one_bit if i % (t + 1) == 0 else zero_bit
            else:
                win = b.take(result, np.arange(i, i + f), axis=0)
                eqs = b.eq(win, frm)
                masked = b.and_(eqs, b.stack([ignore[i + j] for j in range(f)], axis=0))
                flag = b.all_axis(masked, 0)
            if n_enc is not None:
                counter = b.add_chars(counter, self._bit_to_char(flag))
                flag = b.and_(flag, b.ge(n_enc, counter))
            # snapshot gated by flag (mod.rs:957-959)
            snapshot = b.mul_bit(result, flag)
            # write `to` at [i, i+t) and update ignore mask (mod.rs:962-968)
            head = b.take(result, np.arange(i, i + t), axis=0)
            new_head = b.select(flag, to, head)
            not_flag = b.not_(flag)
            for k in range(t):
                ignore[i + k] = b.and_(ignore[i + k], not_flag)
            # shift tail right by size_diff from the snapshot (mod.rs:971-977)
            tail_idx = np.arange(i + t, max_out)
            src_idx = tail_idx - size_diff
            tail_cur = b.take(result, tail_idx, axis=0)
            tail_src = b.take(snapshot, src_idx, axis=0)
            new_tail = b.select(flag, tail_src, tail_cur)
            keep_idx = np.arange(0, i)
            parts = []
            if i > 0:
                parts.append(b.take(result, keep_idx, axis=0))
            parts.append(new_head)
            parts.append(new_tail)
            result = b.concat(parts, axis=0)
        return result  # no compaction (mod.rs:979)

    # ------------------------------------------------------------------
    # split family, src/server_key/split.rs
    # ------------------------------------------------------------------
    def _split(self, s, pat, is_inclusive: bool, is_terminator: bool, n_enc,
               skip_first_edge: bool = False):
        """split.rs:883-988 (forward scan; windows END at i)."""
        b = self.b
        zero = b.trivial_chars(np.zeros(1, np.uint8))
        s = b.concat([s, zero], axis=0)  # push, split.rs:897
        L = b.shape(s)[0]
        m = b.shape(pat)[0]

        ccb = b.trivial_chars(np.uint8(0))  # current copy buffer
        if skip_first_edge and m == 0 and n_enc is not None:
            # splitn empty-pattern skip-first-buffer (split.rs:925-938)
            enc_len = self.len(s)
            should_skip = b.and_(b.gt(n_enc, b.trivial_chars(np.uint8(1))),
                                 b.le(n_enc, enc_len))
            ccb = self._bit_to_char(should_skip)
        allow = None
        if n_enc is not None:
            allow = b.ne(n_enc, b.trivial_chars(np.uint8(0)))  # split.rs:916-919

        stop_inc = b.trivial_bits(0)
        ignore = [b.trivial_bits(1) for _ in range(L)]
        global_found = b.trivial_bits(0)
        cols = []
        buffer_ids = b.trivial_chars(np.arange(L, dtype=np.uint8))

        for i in range(L):
            # copy_logic (split.rs:108-135)
            onehot = b.eq(buffer_ids, ccb)  # [L]
            if allow is not None:
                onehot = b.and_(onehot, allow)
            s_i = b.take(s, np.array([i]), axis=0)  # [1]
            col = b.mul_bit(b.broadcast_to(b.reshape(s_i, (1,)), (L,)), onehot)
            cols.append(col)

            # split_pattern_matching (split.rs:70-106): window ends at i
            if m > L or i < m - 1 or m == 0:
                found = b.trivial_bits(0)
            else:
                start = i - m + 1
                win = b.take(s, np.arange(start, start + m), axis=0)
                eqs = b.eq(win, pat)
                masked = b.and_(eqs, b.stack([ignore[start + j] for j in range(m)], axis=0))
                found = b.all_axis(masked, 0)
            not_found = b.not_(found)
            for j in range(m):
                if i + j < L:
                    ignore[i + j] = b.and_(ignore[i + j], not_found)
            global_found = b.or_(global_found, found)

            # handle_n_case (split.rs:137-178)
            if n_enc is None:
                ccb = b.add_chars(ccb, self._bit_to_char(found))
            else:
                n_minus1 = b.sub_chars(n_enc, b.trivial_chars(np.uint8(1)))
                stop_inc = b.or_(stop_inc, b.eq(ccb, n_minus1))
                inc = b.and_(found, b.not_(stop_inc))
                ccb = b.add_chars(ccb, self._bit_to_char(inc))

        grid = b.stack(cols, axis=1)  # [buffer j, position i]
        buffers = self._clear_pattern_from_result(grid, pat, n_enc,
                                                  is_inclusive, is_terminator)
        return buffers, global_found

    def _rsplit(self, s, pat, is_inclusive: bool, is_terminator: bool, n_enc):
        """split.rs:307-393 (reverse scan; windows START at i; empty-pattern
        padding special case, split.rs:10-68)."""
        b = self.b
        zero = b.trivial_chars(np.zeros(1, np.uint8))
        s = b.concat([s, zero], axis=0)
        L = b.shape(s)[0]
        m = b.shape(pat)[0]

        ccb = b.trivial_chars(np.uint8(0))
        allow = None
        if n_enc is not None:
            allow = b.ne(n_enc, b.trivial_chars(np.uint8(0)))
        stop_inc = b.trivial_bits(0)
        ignore = [b.trivial_bits(1) for _ in range(L)]
        global_found = b.trivial_bits(0)
        cols = [None] * L
        buffer_ids = b.trivial_chars(np.arange(L, dtype=np.uint8))

        for i in range(L - 1, -1, -1):
            onehot = b.eq(buffer_ids, ccb)
            if allow is not None:
                onehot = b.and_(onehot, allow)
            s_i = b.take(s, np.array([i]), axis=0)
            cols[i] = b.mul_bit(b.broadcast_to(b.reshape(s_i, (1,)), (L,)), onehot)

            # rsplit_pattern_matching (split.rs:10-68)
            if m == 0:
                cur_pad = b.eq_zero(b.take(s, np.array([i]), axis=0))
                cur_pad = b.reshape_bits(cur_pad, ())
                if i >= 1:
                    prev_nz = b.ne_zero(b.take(s, np.array([i - 1]), axis=0))
                    prev_nz = b.reshape_bits(prev_nz, ())
                    match_eos = b.and_(prev_nz, cur_pad)
                    found = b.or_(match_eos, b.not_(cur_pad))
                else:
                    found = b.not_(cur_pad)
            elif m > L or i + m >= L:
                found = b.trivial_bits(0)
            else:
                win = b.take(s, np.arange(i, i + m), axis=0)
                eqs = b.eq(win, pat)
                masked = b.and_(eqs, b.stack([ignore[i + j] for j in range(m)], axis=0))
                found = b.all_axis(masked, 0)
            not_found = b.not_(found)
            for j in range(m):
                if i + j < L:
                    ignore[i + j] = b.and_(ignore[i + j], not_found)
            global_found = b.or_(global_found, found)

            if n_enc is None:
                ccb = b.add_chars(ccb, self._bit_to_char(found))
            else:
                n_minus1 = b.sub_chars(n_enc, b.trivial_chars(np.uint8(1)))
                stop_inc = b.or_(stop_inc, b.eq(ccb, n_minus1))
                inc = b.and_(found, b.not_(stop_inc))
                ccb = b.add_chars(ccb, self._bit_to_char(inc))

        grid = b.stack(cols, axis=1)
        buffers = self._clear_pattern_from_result(grid, pat, n_enc,
                                                  is_inclusive, is_terminator)
        return buffers, global_found

    def _clear_pattern_from_result(self, grid, pat, n_enc, is_inclusive,
                                   is_terminator):
        """split.rs:180-305: delete delimiters from each buffer and compact."""
        b = self.b
        nb = b.shape(grid)[0]  # number of buffers == buffer size
        m = b.shape(pat)[0]
        zeros_pat = b.trivial_chars(np.zeros(m, np.uint8))
        rows = [b.take(grid, np.array([j]), axis=0) for j in range(nb)]
        rows = [b.reshape(r, (b.shape(grid)[1],)) for r in rows]

        if n_enc is not None:
            stop_replacing = b.trivial_bits(0)
            out_rows = []
            for j, row in enumerate(rows):
                enc_j1 = b.trivial_chars(np.uint8((j + 1) % 256))
                stop_replacing = b.or_(stop_replacing, b.eq(n_enc, enc_j1))
                current = self.compact_zeros_right(row)
                replaced = self.replace(current, pat, zeros_pat)
                Lr = b.shape(current)[0]
                replaced = b.take(replaced, np.arange(Lr), axis=0)
                out_rows.append(b.select(stop_replacing, current, replaced))
            rows = out_rows
        else:
            if not is_inclusive:
                new_rows = []
                for row in rows:
                    Lr = b.shape(row)[0]
                    rep = self.replace(row, pat, zeros_pat)
                    new_rows.append(b.take(rep, np.arange(Lr), axis=0))
                rows = new_rows
            else:
                rows = [self.compact_zeros_right(r) for r in rows]
            if is_terminator:
                # split.rs:271-302, reproduced literally (including its
                # no-op-for-nonempty-pattern behavior).
                non_zero_found = b.trivial_bits(0)
                for j in range(nb - 1, -1, -1):
                    row = rows[j]
                    is_zero = b.all_axis(b.eq_zero(row), 0)
                    starts = self.starts_with(row, pat)
                    should_delete = b.and_(b.and_(starts, is_zero),
                                           b.not_(non_zero_found))
                    rows[j] = b.mul_bit(row, b.not_(should_delete))
                    non_zero_found = b.or_(non_zero_found, b.not_(is_zero))
        return b.stack(rows, axis=0)

    def split_ascii_whitespace(self, s):
        """split.rs:1377-1447: word-boundary state machine."""
        b = self.b
        L = b.shape(s)[0]
        if L == 0:
            return b.reshape(b.trivial_chars(np.zeros(0, np.uint8)), (0, 0)), \
                b.trivial_bits(0)
        ws = b.is_whitespace(s)  # [L], vectorized
        not_ws = b.not_(ws)
        global_found = b.any_axis(ws, 0)
        ccb = b.trivial_chars(np.uint8(0))
        prev_ws = b.trivial_bits(1)
        cols = []
        buffer_ids = b.trivial_chars(np.arange(L, dtype=np.uint8))
        for i in range(L):
            ws_i = b.reshape_bits(b.take(ws, np.array([i]), axis=0), ())
            nws_i = b.reshape_bits(b.take(not_ws, np.array([i]), axis=0), ())
            should_inc = b.and_(ws_i, b.not_(prev_ws))
            ccb = b.add_chars(ccb, self._bit_to_char(should_inc))
            onehot = b.eq(buffer_ids, ccb)
            copy_flag = b.and_(onehot, nws_i)
            s_i = b.take(s, np.array([i]), axis=0)
            cols.append(b.mul_bit(b.broadcast_to(b.reshape(s_i, (1,)), (L,)),
                                  copy_flag))
            prev_ws = ws_i
        grid = b.stack(cols, axis=1)  # [j, i]
        rows = [self.compact_zeros_right(
            b.reshape(b.take(grid, np.array([j]), axis=0), (L,)))
            for j in range(L)]
        return b.stack(rows, axis=0), global_found
