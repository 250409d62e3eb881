"""Distributed full-graph training: shard_map over a 1-D graph mesh.

Parallelism layout (the new capability vs the single-GPU reference,
SURVEY.md section 2.4):
- adjacency + node arrays row-partitioned over the 'graph' axis,
- model parameters replicated,
- aggregation all-gathers features over ICI (CBSR-compressed on the MaxK
  path — k*(val+sel) bytes/row instead of D*4),
- gradient all-reduce falls out of differentiating shard_map with
  replicated params (psum of per-shard cotangents).

The flax models run unchanged inside shard_map: local_bundle() hands them
per-device TiledGraph views whose ops gather internally.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # JAX >= 0.6 exposes shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from maxk_tpu.data.datasets import Dataset
from maxk_tpu.models.models import build_model
from maxk_tpu.parallel.mesh import make_graph_mesh, GRAPH_AXIS, MODEL_AXIS
from maxk_tpu.parallel.partition import (
    ShardedGraphBundle, shard_bundle, shard_node_array, local_bundle)
from maxk_tpu.train import metrics as metrics_lib
from maxk_tpu.train.loop import (TrainState, TrainResults, FitLoop,
                                 masked_loss)
from maxk_tpu.train.optim import make_optimizer


def _spec_like(tree, spec):
    return jax.tree.map(lambda _: spec, tree)


def put_global(tree, sharding):
    """Place host data onto a (possibly multi-process) mesh sharding.

    Single-process: plain device_put. Multi-process: every process holds
    the full host value (graphs/features are loaded on every host) and
    contributes only its addressable shards via make_array_from_callback
    — device_put would reject shardings that span non-addressable
    devices. `sharding` is a single Sharding (applied to every leaf) or
    a matching tree of them.
    """
    single = isinstance(sharding, jax.sharding.Sharding)
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)
    sh_tree = (jax.tree.map(lambda _: sharding, tree) if single
               else sharding)

    def put(x, sh):
        a = np.asarray(x)
        return jax.make_array_from_callback(a.shape, sh,
                                            lambda idx: a[idx])

    return jax.tree.map(put, tree, sh_tree)


def fetch_global(arr) -> np.ndarray:
    """Host copy of a (possibly multi-process) row-sharded array."""
    if jax.process_count() == 1:
        return np.asarray(arr)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))


class DistTrainer(FitLoop):
    """Row-partitioned full-graph trainer over a device mesh.

    Shares the FitLoop driver with the single-device Trainer, so
    checkpoint/resume, patience early stop, eval-every-N and the final
    results artifact behave identically at any mesh size."""

    def __init__(self, config, dataset: Dataset, mesh: Optional[Mesh] = None,
                 logger=None, writer=None,
                 row_block: Optional[int] = None,
                 edge_tile: Optional[int] = None,
                 col_part_rows: Optional[int] = None):
        self.config = config
        self.dataset = dataset
        self.logger = logger
        self.writer = writer
        self.mesh = mesh if mesh is not None else \
            make_graph_mesh(getattr(config, "n_devices", 0),
                            model_axis_size=getattr(
                                config, "model_parallel", 1))
        self.n_shards = self.mesh.shape[GRAPH_AXIS]
        # Tensor parallelism over the feature dim (SURVEY §2.4: the
        # feature-dimension partitioning the reference lacks): dense-layer
        # kernels column-sharded over the Auto 'model' axis, activation
        # collectives inserted by GSPMD.
        self.model_parallel = self.mesh.shape.get(MODEL_AXIS, 1)

        from maxk_tpu.models.models import MODEL_NORMS
        self.sharded = shard_bundle(
            dataset.csr, self.n_shards, row_block=row_block,
            edge_tile=edge_tile,
            norms=MODEL_NORMS.get(config.model, ("mean", "sum", "sym")),
            halo=getattr(config, "halo", True),
            col_part_rows=col_part_rows)
        v_pad = self.sharded.n_nodes_padded

        self.model = build_model(
            config.model, dataset.in_size, config.hidden_dim,
            config.hidden_layers, dataset.num_classes, maxk=config.maxk,
            feat_drop=config.dropout, norm=config.norm,
            nonlinear=config.nonlinear,
            compute_dtype=getattr(config, "compute_dtype", "bfloat16"),
            # gnn_res BatchNorm syncs its batch statistics over the graph
            # axis (flax axis_name -> pmean inside shard_map); padded rows
            # (< row_block * n_shards of V) enter the stats with zeros.
            bn_axis=GRAPH_AXIS if (config.model == "gnn_res"
                                   and config.norm) else None)
        self.optimizer = make_optimizer(
            config.w_lr, config.w_weight_decay,
            enable_lookahead=getattr(config, "enable_lookahead", False))

        row = NamedSharding(self.mesh, P(GRAPH_AXIS))
        rep = NamedSharding(self.mesh, P())
        tp_kernel = (NamedSharding(self.mesh, P(None, MODEL_AXIS))
                     if self.model_parallel > 1 else rep)

        def state_sharding(tree):
            """Per-leaf at-rest sharding for params / opt-state trees:
            2-D flax Dense kernels (and their Adam moments / Lookahead
            slow copies, whose tree paths also end in 'kernel') are
            column-sharded over the Auto model axis so TP actually
            reduces per-device weight + optimizer memory; every other
            leaf is replicated. The shard_map step's in_specs only name
            the manual graph axis (P()), so the model-axis sharding
            rides through as Auto and no gather materializes a full
            kernel copy."""
            def leaf(path, p):
                is_kernel = path and getattr(path[-1], "key", None) == "kernel"
                if is_kernel and getattr(p, "ndim", None) == 2:
                    return tp_kernel
                return rep
            return jax.tree_util.tree_map_with_path(leaf, tree)

        self._state_sharding = state_sharding

        def constrain_at_rest(tree):
            """Pin a params/opt-state tree to the at-rest shardings inside
            the step: without this, GSPMD propagates the model-sharded
            activations' layout onto 1-D leaves (a bias grad comes out
            P('model')) and the donated state drifts from the placement
            init_state chose."""
            return jax.tree.map(jax.lax.with_sharding_constraint, tree,
                                state_sharding(tree))

        self._constrain_at_rest = constrain_at_rest

        def put_rows(arr, fill=0):
            return put_global(shard_node_array(arr, v_pad, fill=fill), row)

        self.features = put_rows(dataset.features)
        self.labels = put_rows(dataset.labels)
        self.train_mask = put_rows(dataset.train_mask, fill=False)
        self.graph_arrays = put_global(self.sharded, row)
        self._rep = rep
        self._row = row

        axis = GRAPH_AXIS
        tp = self.model_parallel > 1

        def constrain_tp(params):
            """Column-shard every dense kernel over the Auto model axis.

            Matmuls against a (din, dout/mp)-sharded kernel then produce
            model-sharded activations; the all-gather back to full
            channels (MaxK / aggregation need whole rows) is inserted by
            GSPMD where sharding propagation stops. Selection is by leaf
            NAME ('kernel' = flax Dense weights), not ndim, so a future
            2-D non-kernel parameter (e.g. an embedding table) stays
            replicated instead of being silently mis-sharded. 1-D leaves
            (bias/scale/BatchNorm stats) stay replicated."""
            if not tp:
                return params

            def leaf(path, p):
                is_kernel = path and getattr(path[-1], "key", None) == "kernel"
                if not is_kernel:
                    return p
                assert p.ndim == 2, (
                    f"TP expects flax Dense kernels to be 2-D, got "
                    f"{p.shape} at {jax.tree_util.keystr(path)}")
                return jax.lax.with_sharding_constraint(p, P(None, MODEL_AXIS))

            return jax.tree_util.tree_map_with_path(leaf, params)

        def sharded_loss(params, batch_stats, graphs_sharded, x, labels,
                         mask, rng):
            params = constrain_tp(params)
            graphs = local_bundle(graphs_sharded, axis)
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
            variables = {"params": params}
            has_bn = bool(jax.tree_util.tree_leaves(batch_stats))
            if has_bn:
                variables["batch_stats"] = batch_stats
                # BatchNorm stats sync over the graph axis via the model's
                # bn_axis (pmean), so every shard's update is identical.
                logits, mutated = self.model.apply(
                    variables, graphs, x, training=True,
                    rngs={"dropout": rng}, mutable=["batch_stats"])
                new_bs = mutated["batch_stats"]
            else:
                logits = self.model.apply(variables, graphs, x,
                                          training=True,
                                          rngs={"dropout": rng})
                new_bs = batch_stats
            if dataset.multilabel:
                per = optax.sigmoid_binary_cross_entropy(
                    logits, labels).mean(axis=-1)
            else:
                per = optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels)
            m = mask.astype(per.dtype)
            num = jax.lax.psum((per * m).sum(), axis)
            den = jax.lax.psum(m.sum(), axis)
            return num / jnp.maximum(den, 1.0), new_bs

        def sharded_logits(params, batch_stats, graphs_sharded, x):
            params = constrain_tp(params)
            graphs = local_bundle(graphs_sharded, axis)
            variables = {"params": params}
            if jax.tree_util.tree_leaves(batch_stats):
                variables["batch_stats"] = batch_stats
            return self.model.apply(variables, graphs, x, training=False)

        gspec = _spec_like(self.sharded, P(GRAPH_AXIS))
        bspec_of = lambda bs: _spec_like(bs, P())

        def make_step():
            def step(state, graphs_sharded, x, labels, mask, rng):
                loss_fn = _shard_map(
                    sharded_loss, mesh=self.mesh,
                    in_specs=(bspec_of(state.params),
                              bspec_of(state.batch_stats),
                              gspec, P(GRAPH_AXIS), P(GRAPH_AXIS),
                              P(GRAPH_AXIS), P()),
                    out_specs=(P(), bspec_of(state.batch_stats)),
                    axis_names=frozenset({GRAPH_AXIS}),
                    check_vma=False)
                (loss, new_bs), grads = jax.value_and_grad(
                    lambda p: loss_fn(p, state.batch_stats, graphs_sharded,
                                      x, labels, mask, rng),
                    has_aux=True)(state.params)
                updates, opt_state = self.optimizer.update(
                    grads, state.opt_state, state.params)
                params = optax.apply_updates(state.params, updates)
                params = self._constrain_at_rest(params)
                opt_state = self._constrain_at_rest(opt_state)
                return state.replace(params=params, batch_stats=new_bs,
                                     opt_state=opt_state,
                                     epoch=state.epoch + 1), loss
            return jax.jit(step, donate_argnums=(0,))

        def make_logits():
            def logits_fn(state, graphs_sharded, x):
                f = _shard_map(
                    sharded_logits, mesh=self.mesh,
                    in_specs=(bspec_of(state.params),
                              bspec_of(state.batch_stats),
                              gspec, P(GRAPH_AXIS)),
                    out_specs=P(GRAPH_AXIS),
                    axis_names=frozenset({GRAPH_AXIS}),
                    check_vma=False)
                return f(state.params, state.batch_stats, graphs_sharded, x)
            return jax.jit(logits_fn)

        self._make_step = make_step
        self._make_logits = make_logits
        self._jit_step_fn = None
        self._jit_logits_fn = None

    # -- state -----------------------------------------------------------
    # Parameter shapes depend only on feature dims, so init runs once on a
    # single-device (unsharded) graph view and the result is replicated.

    def init_state_concrete(self, graphs_single, features_single,
                            seed: Optional[int] = None) -> TrainState:
        seed = self.config.seed if seed is None else seed
        rng = jax.random.PRNGKey(seed)
        variables = self.model.init({"params": rng, "dropout": rng},
                                    graphs_single, features_single,
                                    training=False)
        params = put_global(variables["params"],
                            self._state_sharding(variables["params"]))
        batch_stats = put_global(
            variables.get("batch_stats", FrozenDict()), self._rep)
        opt_state = self.optimizer.init(variables["params"])
        return TrainState(params=params, batch_stats=batch_stats,
                          opt_state=put_global(
                              opt_state, self._state_sharding(opt_state)),
                          epoch=put_global(jnp.zeros((), jnp.int32),
                                           self._rep))

    def init_state(self, seed: Optional[int] = None) -> TrainState:
        """Concrete init on an unsharded single-device graph view (shapes
        depend only on feature dims), replicated over the mesh."""
        from maxk_tpu.models.models import GraphBundle
        graphs = GraphBundle.for_model(
            self.dataset.csr, self.config.model,
            symmetric=getattr(self.dataset, "symmetric", False))
        return self.init_state_concrete(
            graphs, jnp.asarray(self.dataset.features), seed=seed)

    # -- API ----------------------------------------------------------------

    def _place_state(self, state: TrainState) -> TrainState:
        """Checkpoint-restored leaves come back committed to single
        devices; re-place them with the at-rest shardings (TP kernels
        column-sharded over the model axis, everything else replicated)
        so they are compatible with the shard_map step."""
        return put_global(state, TrainState(
            params=self._state_sharding(state.params),
            batch_stats=jax.tree.map(lambda _: self._rep,
                                     state.batch_stats),
            opt_state=self._state_sharding(state.opt_state),
            epoch=self._rep))

    def train_step(self, state: TrainState, rng):
        if self._jit_step_fn is None:
            self._jit_step_fn = self._make_step()
        return self._jit_step_fn(state, self.graph_arrays, self.features,
                                 self.labels, self.train_mask, rng)

    # FitLoop hook.
    _jit_step = train_step

    def eval_logits(self, state: TrainState):
        if self._jit_logits_fn is None:
            self._jit_logits_fn = self._make_logits()
        out = self._jit_logits_fn(state, self.graph_arrays, self.features)
        return fetch_global(out)[: self.dataset.csr.n_nodes]

    def evaluate_masks(self, state: TrainState):
        logits = self.eval_logits(state)
        ds = self.dataset
        return tuple(
            metrics_lib.evaluate_logits(logits, ds.labels, m, ds.metric)
            for m in (ds.train_mask, ds.val_mask, ds.test_mask))

    def fit(self, state: Optional[TrainState] = None,
            init_graphs=None, init_features=None) -> TrainResults:
        """FitLoop driver; init_graphs/init_features optionally supply a
        prebuilt single-device view for parameter init (compat with
        scaling_bench's explicit-init flow)."""
        if state is None and init_graphs is not None:
            state = self.init_state_concrete(init_graphs, init_features)
        return FitLoop.fit(self, state)
