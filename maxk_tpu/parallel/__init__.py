from maxk_tpu.parallel.mesh import make_graph_mesh
from maxk_tpu.parallel.partition import (
    ShardedTiles, ShardedGraphBundle, shard_graph, shard_bundle,
    shard_node_array, local_bundle, pad_nodes)
from maxk_tpu.parallel.dist_train import DistTrainer

__all__ = [
    "make_graph_mesh", "ShardedTiles", "ShardedGraphBundle", "shard_graph",
    "shard_bundle", "shard_node_array", "local_bundle", "pad_nodes",
    "DistTrainer",
]
