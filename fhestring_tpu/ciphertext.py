"""Ciphertext containers: FheChar, FheString, FheSplit, FheStrip.

Data-model parity with the reference's src/ciphertext/ module:
- FheChar       <-> FheAsciiChar (fheasciichar.rs:8-10): one 8-bit char as
                    4 radix blocks; also used for encrypted booleans (0/1)
                    and encrypted counts, exactly like the reference.
- FheString     <-> FheString (fhestring.rs:6-9): chars + \0-padding protocol.
- FheSplit      <-> FheSplit (fhesplit.rs:5-8): fixed buffer grid + found flag.
- FheStrip      <-> FheStrip (fhestrip.rs:4-7): string + found flag.

Representation: a batch-first Blocks tensor — FheString ct has shape
[L, 4, kN+1] — so every string method vectorizes over positions natively.
"""

from __future__ import annotations

import dataclasses
import enum

import jax
import jax.numpy as jnp

from .shortint import Blocks


class Comparison(enum.Enum):
    """Ordering selector (reference src/ciphertext/fhestring.rs:11-16)."""

    LessThan = "lt"
    LessEqual = "le"
    GreaterThan = "gt"
    GreaterEqual = "ge"


@dataclasses.dataclass
class FheChar:
    """Encrypted u8 (blocks shape [4, kN+1])."""

    blocks: Blocks


@dataclasses.dataclass
class FheString:
    """Encrypted \0-padded string (blocks shape [L, 4, kN+1]).

    L is the public buffer length (true length is hidden by padding,
    reference src/main.rs:10-12, client_key.rs:57)."""

    blocks: Blocks

    def __len__(self) -> int:
        return self.blocks.ct.lo.shape[0]

    # --- structural API parity with reference fhestring.rs:19-90 ---
    @classmethod
    def from_chars(cls, chars: list[FheChar]) -> "FheString":
        """from_vec (reference fhestring.rs:19-26)."""
        from . import torus

        ct = torus.stack([c.blocks.ct for c in chars], axis=0)
        deg = max((c.blocks.degree for c in chars), default=0)
        var = max((c.blocks.noise_var for c in chars), default=0.0)
        return cls(Blocks(ct, deg, var))

    def is_empty_buffer(self) -> bool:
        """Public buffer emptiness (fhestring.rs:38; NOT the encrypted
        is_empty predicate — that's ServerKey.is_empty)."""
        return len(self) == 0

    def __getitem__(self, idx) -> "FheString | FheChar":
        """Index / Index<RangeTo> (fhestring.rs:70-90)."""
        from .torus import U64

        lo, hi = self.blocks.ct.lo, self.blocks.ct.hi
        if isinstance(idx, slice):
            return FheString(Blocks(U64(lo[idx], hi[idx]),
                                    self.blocks.degree,
                                    self.blocks.noise_var))
        return FheChar(Blocks(U64(lo[idx], hi[idx]), self.blocks.degree,
                              self.blocks.noise_var))

    def append(self, other: "FheString") -> "FheString":
        """Buffer concatenation (fhestring.rs:44-48). Purely structural —
        the padding-aware concatenate lives on ServerKey."""
        from . import torus

        return FheString(Blocks(
            torus.concatenate([self.blocks.ct, other.blocks.ct], axis=0),
            max(self.blocks.degree, other.blocks.degree),
            max(self.blocks.noise_var, other.blocks.noise_var)))

    def push(self, c: FheChar) -> "FheString":
        """Append one char (fhestring.rs:50-52)."""
        from . import torus
        from .torus import U64

        cb = c.blocks.ct
        one = U64(cb.lo[None], cb.hi[None])
        return FheString(Blocks(
            torus.concatenate([self.blocks.ct, one], axis=0),
            max(self.blocks.degree, c.blocks.degree),
            max(self.blocks.noise_var, c.blocks.noise_var)))

    def chars(self) -> list[FheChar]:
        """Iterator parity (fhestring.rs:58-68)."""
        return [self[i] for i in range(len(self))]


@dataclasses.dataclass
class FheSplit:
    """Split result: [n_buffers, L] char grid + encrypted found flag
    (reference fhesplit.rs:5-26: n_buffers fixed = padded len + 1)."""

    buffers: Blocks  # [n_buffers, L, 4, kN+1]
    pattern_found: FheChar


@dataclasses.dataclass
class FheStrip:
    """strip_prefix/strip_suffix result (reference fhestrip.rs:4-15)."""

    string: FheString
    pattern_found: FheChar


def _register(cls, fields):
    def flatten(x):
        return tuple(getattr(x, f) for f in fields), None

    def unflatten(_, children):
        return cls(*children)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)


_register(FheChar, ("blocks",))
_register(FheString, ("blocks",))
_register(FheSplit, ("buffers", "pattern_found"))
_register(FheStrip, ("string", "pattern_found"))


@dataclasses.dataclass
class PublicParameters:
    """Public, non-secret parameters shipped to the server (reference
    src/ciphertext/public_parameters.rs:5-17; the reference also carries a
    tfhe PublicKey there but never uses it — fheasciichar.rs:22)."""

    num_blocks: int = 4
