"""Multi-chip execution: shard the PBS batch / character lanes over a mesh.

The reference is single-process, single-node (rayon threads only —
SURVEY.md section 2.4); parallel scale-out is new design territory for the
TPU build. The unit of parallelism here is the PBS batch axis (string
positions x radix blocks x concurrent ops): pure data parallelism across
chips, with evaluation keys replicated (48 MB BSK + 61 MB KSK). Aggregate
bits (contains' OR-tree, len's popcount, eq's AND-tree) reduce across chips
via XLA collectives inserted by GSPMD — they ride ICI, not DCN.

NTT-stage/TP sharding of the polynomial axis (for very large N or key-
sharded deployments) is a planned extension; see SURVEY.md section 7 step 8.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "data"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (BATCH_AXIS,))


def shard_string(mesh: Mesh, blocks):
    """Place an FheString block tensor with its position axis sharded over
    the mesh (sequence/lane parallelism)."""
    spec = NamedSharding(mesh, P(BATCH_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, spec), blocks)


def replicate(mesh: Mesh, tree):
    spec = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, spec), tree)


def pbs_batch_sharded(ct, lut_idx, lut_bank, keys, mesh: Mesh,
                      use_pallas: bool = False):
    """Batched PBS with the batch axis sharded over the mesh.

    Explicit shard_map (not GSPMD auto-sharding): each chip runs the full
    blind-rotation loop on its lane slice with evaluation keys + LUT bank
    replicated. There is no cross-chip communication inside a PBS — the
    collectives appear only in the aggregate reductions the string engine
    runs on the PBS outputs (contains' OR-tree, len's popcount, ...),
    which GSPMD lowers to psum over ICI.

    ct: U64 [B, kN+1] with B divisible by the mesh size.
    """
    from functools import partial

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    from .crypto.pbs import pbs_batch

    spec_b = P(BATCH_AXIS)
    spec_r = P()

    fn = shard_map(
        partial(pbs_batch, use_pallas=use_pallas),
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: spec_b, ct),
            spec_b,
            jax.tree.map(lambda _: spec_r, lut_bank),
            jax.tree.map(lambda _: spec_r, keys),
        ),
        out_specs=jax.tree.map(lambda _: spec_b, ct),
        check_vma=False,
    )
    return fn(ct, lut_idx, lut_bank, keys)
