"""Device-mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axis_sizes: Tuple[int, ...], axis_names: Tuple[str, ...],
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a Mesh over the given (or CPU-fallback) devices.

    On this image the real chip lives behind the 'axon' platform; tests and
    dry runs use the 8 virtual CPU devices.
    """
    if devices is None:
        try:
            devices = jax.devices("cpu")
        except RuntimeError:
            devices = jax.devices()
    n = int(np.prod(axis_sizes))
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(axis_sizes)
    return Mesh(arr, axis_names)
