"""Device-mesh helpers.

The reference is single-process NumPy with no distribution of any kind
(SURVEY.md section 2); multi-chip scaling here is a new first-class
component: volumes shard spatially (XLA GSPMD inserts halo exchanges for the
separable convolutions), and the embarrassingly parallel axes (descriptor
pairs, pose candidates) shard as data parallelism with collective top-k /
gather reductions over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "x") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def volume_sharding(mesh: Mesh, axis: str = "x") -> NamedSharding:
    """Shard a 3D volume along its first spatial axis."""
    return NamedSharding(mesh, P(axis, None, None))


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "x") -> NamedSharding:
    """Shard the leading (batch) axis of an array."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
