"""Device-mesh helpers for data-parallel scaling over ICI.

The reference is single-device (SURVEY.md §2.3: no distributed code exists);
scaling here is net-new TPU design: a 1-D ``data`` mesh, batches sharded over
it, parameters replicated, and XLA inserting the gradient ``psum`` over ICI.
The same code runs on a real pod slice or on CPU fake devices
(``--xla_force_host_platform_device_count=N``) for tests and dry runs.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices but only {len(devices)} available")
    return Mesh(np.asarray(devices[:n]), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis))
