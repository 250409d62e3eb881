"""Device mesh helpers.

The graph axis is the 1-D row-partitioning axis of the adjacency and node
features (the chip-granularity analog of the reference's warp-level row
splitting, SURVEY.md section 2.4). Multi-host pods simply contribute more
devices to the same axis; XLA routes the collectives over ICI within a
slice and DCN across slices.

An optional second "model" axis adds tensor parallelism over the feature
dimension: the dense-layer kernels are column-sharded over it and XLA
(GSPMD) inserts the activation all-gathers. The graph axis stays manual
(shard_map with explicit halo collectives); the model axis is an Auto
axis resolved by the compiler — the hybrid manual/auto shard_map pattern.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import AxisType, Mesh

GRAPH_AXIS = "graph"
MODEL_AXIS = "model"


def make_graph_mesh(n_devices: Optional[int] = None,
                    axis_name: str = GRAPH_AXIS,
                    model_axis_size: int = 1) -> Mesh:
    """1-D graph mesh, or a (graph, model) 2-D mesh when
    model_axis_size > 1. `n_devices` is the TOTAL device count (the graph
    axis gets n_devices // model_axis_size shards)."""
    devices = jax.devices()
    if n_devices is None or n_devices == 0:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"requested {n_devices} devices, have {len(devices)}")
    if model_axis_size <= 1:
        return jax.make_mesh((n_devices,), (axis_name,),
                             devices=devices[:n_devices])
    if n_devices % model_axis_size:
        raise ValueError(
            f"n_devices={n_devices} not divisible by "
            f"model_axis_size={model_axis_size}")
    # Both axes Auto-typed: shard_map promotes the graph axis to Manual
    # inside its region (axis_names={GRAPH_AXIS}); the model axis stays
    # Auto so in-body with_sharding_constraint can target it.
    return jax.make_mesh(
        (n_devices // model_axis_size, model_axis_size),
        (axis_name, MODEL_AXIS),
        axis_types=(AxisType.Auto, AxisType.Auto),
        devices=devices[:n_devices])
