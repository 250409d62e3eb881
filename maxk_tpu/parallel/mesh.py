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

import os
from typing import Optional

import jax
from jax.sharding import AxisType, Mesh

GRAPH_AXIS = "graph"
MODEL_AXIS = "model"


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_count: Optional[int] = None,
                     enable: bool = True) -> bool:
    """Multi-host bootstrap: one call per process, before backend init.

    The reference is single-process/single-GPU (SURVEY §2.4: no
    torch.distributed anywhere); this is the N>=2-hosts half of the
    north star. On a real TPU pod slice the three arguments can all be
    None — `jax.distributed.initialize()` reads the TPU metadata — so
    `train.py --distributed` alone suffices there. On CPU/GPU (and in
    the multi-process tests) pass coordinator ("host:port"),
    num_processes, and process_id explicitly.

    local_device_count: force this many virtual CPU devices per process
    (test/emulation mode) — must be set before the backend initializes.

    Returns True when a multi-process runtime was initialized. After it,
    jax.devices() is the GLOBAL device list and make_graph_mesh builds
    pod-wide meshes; XLA routes collectives over ICI within a slice and
    DCN/TCP across hosts — no hand-rolled transport (SURVEY §2.4).
    """
    if local_device_count:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count="
                f"{local_device_count}").strip()
    # enable=False: virtual-device flag only, no multi-process runtime
    # (train.py --local_device_count N without --distributed).
    if not enable or (num_processes is not None and num_processes <= 1):
        return False
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return jax.process_count() > 1


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
