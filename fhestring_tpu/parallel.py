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
