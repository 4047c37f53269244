"""Device mesh construction and data-parallel shardings.

The reference is single-process single-device (SURVEY.md §2.2-2.3); this
module is new capability: a 1-D ``data`` mesh over all chips of a pod
slice. Params/optimizer state are replica-only (the models are ~0.1-0.4M
params — sharding them is pure overhead, BASELINE.json:5); batches are
sharded along ``data``. Gradients are reduced by XLA-inserted all-reduce
over ICI (intra-slice) / DCN (cross-host) when the jit-ed train step
consumes sharded batches and produces replicated params.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(n_devices: int = 0, axis_name: str = "data") -> Mesh:
    """1-D mesh over the first n_devices (0 = all visible devices).

    Auto axis type: the train step uses with_sharding_constraint as a GSPMD
    hint (jax 0.9's default Explicit axes would turn it into an assert).
    """
    devices = jax.devices()
    if n_devices:
        devices = devices[:n_devices]
    return jax.make_mesh(
        (len(devices),),
        (axis_name,),
        axis_types=(jax.sharding.AxisType.Auto,),
        devices=np.asarray(devices),
    )


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated (params, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays, axis_name: str = "data"):
    """Place host arrays as batch-sharded device arrays."""
    s = batch_sharding(mesh, axis_name)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out[0] if len(out) == 1 else out


def replicate(mesh: Mesh, tree):
    """Place a pytree fully replicated on the mesh."""
    s = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, s), tree)
