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

import jax

from .shortint import Blocks


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
