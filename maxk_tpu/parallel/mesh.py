"""Device mesh helpers.

The graph axis is the 1-D row-partitioning axis of the adjacency and node
features (the chip-granularity analog of the reference's warp-level row
splitting, SURVEY.md section 2.4). Multi-host pods simply contribute more
devices to the same axis; XLA routes the collectives over ICI within a
slice and DCN across slices.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh

GRAPH_AXIS = "graph"


def make_graph_mesh(n_devices: Optional[int] = None,
                    axis_name: str = GRAPH_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is None or n_devices == 0:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"requested {n_devices} devices, have {len(devices)}")
    return jax.make_mesh((n_devices,), (axis_name,),
                         devices=devices[:n_devices])
