"""Cryptographic parameter sets for the TPU-native TFHE engine.

The reference (MakisChristou/fhestring) delegates all FHE math to tfhe-rs
0.5.2 with the preset ``PARAM_MESSAGE_2_CARRY_2_KS_PBS`` and 4 radix blocks
per 8-bit character (reference: src/main.rs:3,22-23,43, src/client_key.rs:31).
We mirror that parameter set exactly (``PARAM_MESSAGE_2_CARRY_2_KS_PBS_64``)
so that noise budgets and plaintext encodings line up with the reference
semantics, plus small deterministic parameter sets for fast CI.

Unlike tfhe-rs, our polynomial products are *exact* integer negacyclic
convolutions (int8-limb matmuls on the TPU MXU) rather than f64 FFTs, so
there is no transform noise term; parity with the reference is asserted at
the decrypted-plaintext level (see SURVEY.md section 6 "Hard parts").
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass(frozen=True)
class CryptoParams:
    """TFHE/CGGI parameter set (KS→PBS order, as in tfhe-rs ``*_KS_PBS``).

    Ciphertexts "at rest" live under the large GLWE-derived LWE key of
    dimension ``k*N``; a LUT evaluation keyswitches down to the small LWE key
    (dimension ``n``) and bootstraps back up.
    """

    name: str
    # Arithmetic modulus q = 2**q_bits. Always 64: torus arithmetic is
    # carried on uint32 limb pairs wrapping mod 2**64 (torus.py).
    q_bits: int
    # Small LWE dimension (blind-rotation loop length).
    lwe_dimension: int
    # GLWE dimension k and polynomial size N. Large LWE key dim = k*N.
    glwe_dimension: int
    polynomial_size: int
    # Noise standard deviations, relative to q (tfhe-rs "modular std dev").
    lwe_noise_std: float
    glwe_noise_std: float
    # PBS (bootstrap key) gadget decomposition.
    pbs_base_log: int
    pbs_level: int
    # Keyswitch gadget decomposition.
    ks_base_log: int
    ks_level: int
    # Shortint encoding: plaintext space p = message_modulus * carry_modulus,
    # encoded in the top 1 (padding) + log2(p) bits of the torus.
    message_modulus: int = 4
    carry_modulus: int = 4
    # Radix: number of shortint blocks per 8-bit character.
    num_blocks: int = 4
    # Effective torus precision: ciphertext values are multiples of
    # 2**(64 - torus_bits), i.e. they live in the subgroup
    # 2**(64-torus_bits) * Z / 2**64 Z  ~  Z / 2**torus_bits Z.
    # torus_bits=64 is the tfhe-rs-mirroring default; torus_bits=32 is the
    # TPU turbo mode: all mod-2**64 arithmetic is inherited unchanged (the
    # subgroup is closed under +, -, and integer scaling), but key material
    # halves and the low 4 of 8 balanced byte-limb planes of every key
    # polynomial are exactly zero, which the kernels exploit.  Only noise
    # and uniform-mask sampling change (quantized to the subgroup).
    torus_bits: int = 64

    # ---- derived quantities -------------------------------------------------
    @property
    def q(self) -> int:
        return 1 << self.q_bits

    @property
    def big_lwe_dimension(self) -> int:
        return self.glwe_dimension * self.polynomial_size

    @property
    def plaintext_space(self) -> int:
        """Number of plaintext slots below the padding bit (16 for 2_2)."""
        return self.message_modulus * self.carry_modulus

    @property
    def full_space(self) -> int:
        """Plaintext slots including the padding bit (32 for 2_2)."""
        return 2 * self.plaintext_space

    @property
    def delta(self) -> int:
        """Plaintext scaling factor: m is encoded as m * delta."""
        return self.q // self.full_space

    @property
    def bits_per_block(self) -> int:
        return int(math.log2(self.message_modulus))

    def __post_init__(self) -> None:
        assert self.message_modulus & (self.message_modulus - 1) == 0
        assert self.polynomial_size & (self.polynomial_size - 1) == 0
        assert self.polynomial_size >= self.full_space, (
            "test polynomial needs at least one coefficient per plaintext slot"
        )
        assert self.q_bits == 64, "torus arithmetic is mod 2**64 (torus.py)"
        assert self.torus_bits in (32, 64)
        # Gadget ladders must stay inside the torus precision: digits are
        # taken from the top torus_bits bits, so deeper ladders would read
        # quantization zeros.
        assert self.pbs_base_log * self.pbs_level <= self.torus_bits
        assert self.ks_base_log * self.ks_level <= self.torus_bits
        # delta (and every encode()d constant) must lie in the subgroup.
        assert self.delta % (1 << (64 - self.torus_bits)) == 0


# ---------------------------------------------------------------------------
# Production parameter set: mirrors tfhe-rs 0.5.2 PARAM_MESSAGE_2_CARRY_2_KS_PBS
# (the set the reference binary uses, src/main.rs:3). 128-bit security.
# ---------------------------------------------------------------------------
PARAM_MESSAGE_2_CARRY_2_KS_PBS_64 = CryptoParams(
    name="msg2_carry2_ks_pbs_q64",
    q_bits=64,
    lwe_dimension=742,
    glwe_dimension=1,
    polynomial_size=2048,
    lwe_noise_std=0.000007069849454709433,
    glwe_noise_std=0.00000000000000029403601535432533,
    pbs_base_log=23,
    pbs_level=1,
    ks_base_log=3,
    ks_level=5,
)

# Default production alias used by client/server APIs.
PARAM_PROD = PARAM_MESSAGE_2_CARRY_2_KS_PBS_64

# ---------------------------------------------------------------------------
# Small parameter sets for CI. Zero/tiny noise keeps tests deterministic and
# fast while exercising every code path (decomposition rounding, modswitch
# drift and negacyclic wraparound still occur).  NOT SECURE — tests only.
# ---------------------------------------------------------------------------
PARAM_TEST_ZERO_NOISE = CryptoParams(
    name="test_zero_noise",
    q_bits=64,
    lwe_dimension=16,
    glwe_dimension=1,
    polynomial_size=256,
    lwe_noise_std=0.0,
    glwe_noise_std=0.0,
    pbs_base_log=23,
    pbs_level=1,
    ks_base_log=3,
    ks_level=5,
)

PARAM_TEST_NOISY = CryptoParams(
    name="test_noisy",
    q_bits=64,
    lwe_dimension=32,
    glwe_dimension=1,
    polynomial_size=512,
    lwe_noise_std=2.0**-40,
    glwe_noise_std=2.0**-45,
    pbs_base_log=23,
    pbs_level=1,
    ks_base_log=3,
    ks_level=5,
)

# Statistically meaningful CI noise set: same RELATIVE lwe noise as prod
# (sigma_lwe ~ 2^-17.1) so keyswitch output noise exercises the same order
# of magnitude of the half-slot margin as production, at CI-sized dims.
# Small n/N keep the absolute blind-rotation noise low, so the margin here
# is wider than prod's — prod margins are measured on-device by
# benchmarks/noise_calibration.py. NOT SECURE — tests only.
PARAM_TEST_STAT = CryptoParams(
    name="test_stat",
    q_bits=64,
    lwe_dimension=32,
    glwe_dimension=1,
    polynomial_size=256,
    lwe_noise_std=0.000007069849454709433,
    glwe_noise_std=2.0**-40,
    pbs_base_log=23,
    pbs_level=1,
    ks_base_log=3,
    ks_level=5,
)
