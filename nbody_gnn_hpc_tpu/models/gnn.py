"""N-body message-passing GNN (Flax).

Architecture parity target: ``src/ai/model.py`` — the same computation graph
and parameter count (2,550,150 at hidden 256 / 6 layers — METHODOLOGY.md:238):

- node encoder Linear(7->H) -> LayerNorm -> SiLU -> Dropout -> Linear(H->H)
  (``model.py:91-97``);
- n_layers ParticleInteractionLayers with residual + LayerNorm
  (``model.py:100-107,162-164``), each layer:
  edge MLP Linear(2H+5->H) -> LN -> SiLU -> Dropout -> Linear(H->H) on
  [h_target, h_source, edge_attr], sum-aggregated at the edge target, then
  node MLP Linear(2H->H) -> LN -> SiLU -> Dropout -> Linear(H->H_node) on
  [h, agg] (``model.py:38-65``);
- decoder Linear(H->H) -> SiLU -> Dropout -> Linear(H->H/2) -> SiLU ->
  Linear(H/2->6) with the FINAL layer zero-initialized so the untrained
  model predicts delta == 0 (``model.py:111-122``);
- output = current_state + delta (residual prediction, ``model.py:170``);
- edge features computed ONCE from positions and shared by all layers
  (``model.py:153-156``).

TPU-first deviations from the PyG design: gather/scatter via take +
``segment_sum`` over a static (2, E) edge array (no dynamic graph batching —
every graph in this problem has the same N and edge set, so batching is a
``vmap`` over a dense (B, N, F) axis instead of PyG's flattened Batch).
"""

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from nbody_gnn_hpc_tpu.ops.edges import edge_features

EDGE_DIM = 5  # distance(1) + direction(3) + inv_dist_sq(1) — model.py:88


class _MLPBlock(nn.Module):
    """Linear -> LayerNorm -> SiLU -> Dropout -> Linear (the reference's
    recurring Sequential motif, e.g. model.py:38-44).

    ``dtype`` is the matmul compute dtype (bfloat16 targets the MXU at 4x
    the f32 rate); params and LayerNorm statistics stay float32, and the
    block returns float32, so residuals/aggregations accumulate in f32.
    """

    hidden: int
    out: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool):
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.LayerNorm(dtype=jnp.float32)(x.astype(jnp.float32))
        x = nn.silu(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.out, dtype=self.dtype)(x).astype(jnp.float32)


def target_adjacency(edge_index, n_nodes: int, dtype=jnp.bfloat16):
    """(adj, deg) for matmul aggregation: adj[t, e] = 1 iff edge e's target
    is node t (exact in bfloat16), deg[t] = in-degree as float32.

    ``adj @ messages`` sums each target's incoming messages on the MXU with
    float32 accumulation — replacing the scatter-add that TPU lowers slowly.
    The k-NN relation is NOT target-regular (in-degree varies around k), so
    a dense (N, k) transpose table doesn't exist; the one-hot matmul handles
    the irregularity for free.
    """
    targets = edge_index[1]
    adj = (targets[None, :] == jnp.arange(n_nodes)[:, None]).astype(dtype)
    deg = jnp.zeros((n_nodes,), jnp.float32).at[targets].add(1.0)
    return adj, deg


class _AggregatedDense(nn.Module):
    """The edge-output Dense pulled through the sum aggregation.

    Per-edge messages are ``z_e @ W + b``; their sum over the deg_t edges
    into target t is ``(Σ z_e) @ W + deg_t · b`` — algebraically identical,
    but the (E, H) message tensor never exists: the aggregation runs on the
    pre-Dense activations and the Dense on the (N, H) result. Parameter
    names/shapes/init match ``nn.Dense(name='edge_out')`` exactly, so
    round-1 checkpoints load unchanged.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, summed, deg):
        in_dim = summed.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_dim, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = summed.astype(self.dtype) @ kernel.astype(self.dtype)
        return y.astype(jnp.float32) + deg[:, None] * bias


class _DenseKernel(nn.Module):
    """Bare Dense kernel param — same name/shape/init as ``nn.Dense`` so the
    fused edge path shares checkpoints with the XLA path."""

    features: int
    in_dim: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (self.in_dim, self.features))


class _DenseParams(nn.Module):
    """Bare Dense kernel + bias params (names/shapes/inits match
    ``nn.Dense``) for the fully-fused layer."""

    features: int
    in_dim: int

    @nn.compact
    def __call__(self):
        return (self.param("kernel", nn.initializers.lecun_normal(),
                           (self.in_dim, self.features)),
                self.param("bias", nn.initializers.zeros, (self.features,)))


class _MLPParams(nn.Module):
    """Bare param twin of ``_MLPBlock`` (child names Dense_0 / LayerNorm_0 /
    Dense_1 match its auto-named submodules) so fully-fused checkpoints are
    interchangeable with the XLA branch."""

    hidden: int
    out: int
    in_dim: int

    @nn.compact
    def __call__(self):
        return (_DenseParams(self.hidden, self.in_dim, name="Dense_0")(),
                _LayerNormParams(self.hidden, name="LayerNorm_0")(),
                _DenseParams(self.out, self.hidden, name="Dense_1")())


class _LayerNormParams(nn.Module):
    """Bare LayerNorm scale/bias params (names match ``nn.LayerNorm``)."""

    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.dim,)),
                self.param("bias", nn.initializers.zeros, (self.dim,)))


class ParticleInteractionLayer(nn.Module):
    """Message-passing layer (parity: ``model.py:22-65``).

    Message for edge (row -> col): edge_mlp([h[col], h[row], e]) — PyG's
    (x_i, x_j) with i = target = edge_index[1]; sum-aggregated at targets;
    node update node_mlp([h, agg]).

    TPU optimizations (math-identical; same parameter tree):

    1. The first edge Dense on the concatenation [h_i, h_j, e] is decomposed
       as W^T [h_i; h_j; e] + b = (W_t^T h)_i + (W_s^T h)_j + W_e^T e + b,
       so the two node projections run at NODE granularity and are gathered
       per edge — no (E, 2H+5) concat, and the dominant matmul shrinks to
       two (N, H) x (H, H) ones plus gathers.
    2. Aggregation is an MXU matmul against a one-hot target adjacency
       (f32 accumulation) instead of a scatter-add, and the edge-output
       Dense is pulled through the sum (``_AggregatedDense``), so the only
       (E, H) tensors are the fused LN→SiLU→dropout activation stream.
    """

    node_features: int
    hidden_dim: int = 128
    dropout: float = 0.1
    dtype: Any = jnp.float32
    gather_mode: str = "take"  # "take" (gather/scatter) | "matmul" (MXU)
    # "xla": the matmul/take formulations below. "fused": single Pallas
    # kernel for the whole edge stream (ops/fused_edge.py) — TPU only,
    # row-regular edges (any N; odd N pads internally); same parameter
    # tree either way.
    edge_impl: str = "xla"

    @nn.compact
    def __call__(self, h, edge_index, edge_attr, deterministic: bool = True,
                 adj=None, deg=None):
        n_nodes = h.shape[-2]
        if adj is None or deg is None:
            adj, deg = target_adjacency(edge_index, n_nodes, self.dtype)
        if self.edge_impl == "fused_full":
            return self._fused_full_layer(h, edge_attr, deg, adj,
                                          deterministic)
        # Decomposed Dense(2H+5 -> H): target/source node projections + edge
        # feature projection (bias lives on the target projection only).
        t_proj = nn.Dense(self.hidden_dim, dtype=self.dtype,
                          name="edge_proj_target")(h)            # (N, H)
        s_proj = nn.Dense(self.hidden_dim, dtype=self.dtype, use_bias=False,
                          name="edge_proj_source")(h)            # (N, H)
        if self.edge_impl == "fused":
            summed = self._fused_stream(h, edge_attr, t_proj, s_proj, adj,
                                        deterministic)
            agg = _AggregatedDense(self.hidden_dim, dtype=self.dtype,
                                   name="edge_out")(summed, deg)
            node_in = jnp.concatenate([h, agg], axis=-1)
            return _MLPBlock(self.hidden_dim, self.node_features,
                             self.dropout, dtype=self.dtype,
                             name="node_mlp")(node_in, deterministic)
        e_proj = nn.Dense(self.hidden_dim, dtype=self.dtype, use_bias=False,
                          name="edge_proj_attr")(edge_attr)      # (E, H)
        if self.gather_mode == "matmul":
            # Scatter-free formulation. Both edge builders in this framework
            # (ops/knn.py) emit row-regular layouts — edge e = (row, col)
            # with row == repeat(arange(N), k) — so the source gather is a
            # broadcast over a (N, k, H) view (VJP: a k-axis reduction), and
            # the target gather is a one-hot matmul adj^T @ t_proj (VJP:
            # adj @ dz, also a matmul). No gather/scatter anywhere in the
            # train step; every data movement rides the MXU. Bitwise equal
            # to "take": one-hot bf16 matmul with f32 accumulation selects
            # rows exactly (tests/test_mxu_aggregation.py pins fwd+grads).
            n_edges = e_proj.shape[0]
            k = n_edges // n_nodes
            zt = jnp.matmul(adj.T, t_proj.astype(self.dtype),
                            preferred_element_type=jnp.float32
                            ).astype(self.dtype)                 # (E, H)
            z = (zt.reshape(n_nodes, k, -1)
                 + s_proj[:, None, :]
                 + e_proj.reshape(n_nodes, k, -1)
                 ).reshape(n_edges, -1)                          # (E, H)
        else:
            z = (jnp.take(t_proj, edge_index[1], axis=0)
                 + jnp.take(s_proj, edge_index[0], axis=0)
                 + e_proj)                                       # (E, H)
        # LayerNorm -> SiLU -> Dropout (model.py:40-43), kept in the compute
        # dtype end-to-end: the (E, H) stream is the bandwidth bottleneck
        # and these activations are normalized (bf16-safe).
        z = nn.LayerNorm(dtype=self.dtype, name="edge_norm")(z)
        z = nn.silu(z)
        z = nn.Dropout(self.dropout, deterministic=deterministic)(z)

        # Sum-aggregate at targets on the MXU (f32 accumulation), then the
        # pulled-through edge-output Dense.
        summed = jnp.matmul(adj, z.astype(self.dtype),
                            preferred_element_type=jnp.float32)  # (N, H)
        agg = _AggregatedDense(self.hidden_dim, dtype=self.dtype,
                               name="edge_out")(summed, deg)
        node_in = jnp.concatenate([h, agg], axis=-1)
        return _MLPBlock(self.hidden_dim, self.node_features, self.dropout,
                         dtype=self.dtype,
                         name="node_mlp")(node_in, deterministic)

    def _fused_full_layer(self, h, edge_attr, deg, adj, deterministic: bool):
        """Whole layer as ONE Pallas kernel (ops/fused_edge_full.py):
        projections + edge stream + aggregation + edge_out + node MLP all
        in-kernel; per-layer HBM traffic is params + one (N, H) in/out.
        Param tree is identical to the XLA branch (bare-param twins), so
        checkpoints are interchangeable across edge_impl settings."""
        from nbody_gnn_hpc_tpu.ops.fused_edge_full import fused_full_layer

        n_nodes = h.shape[-2]
        hd = self.hidden_dim
        k = edge_attr.shape[-2] // n_nodes
        wt, bt = _DenseParams(hd, h.shape[-1], name="edge_proj_target")()
        ws = _DenseKernel(hd, h.shape[-1], name="edge_proj_source")()
        we = _DenseKernel(hd, edge_attr.shape[-1], name="edge_proj_attr")()
        ge, be = _LayerNormParams(hd, name="edge_norm")()
        wout, bout = _DenseParams(hd, hd, name="edge_out")()
        ((w1, b1), (g1, be1), (w2, b2)) = _MLPParams(
            hd, self.node_features, h.shape[-1] + hd, name="node_mlp")()
        training = (not deterministic) and self.dropout > 0
        if training:
            r1, r2 = jax.random.split(self.make_rng("dropout"))
            seed = jax.random.randint(r1, (1, 1), 0, 2_147_483_647,
                                      dtype=jnp.int32)
            keep = 1.0 - self.dropout
            node_mask = (jax.random.bernoulli(r2, keep, (n_nodes, hd))
                         .astype(jnp.float32) / keep)
        else:
            seed = jnp.zeros((1, 1), jnp.int32)
            node_mask = jnp.ones((n_nodes, hd), jnp.float32)
        params = dict(wt=wt.astype(self.dtype), bt=bt, ws=ws.astype(self.dtype),
                      we=we, ge=ge, be=be, wout=wout, bout=bout,
                      w1=w1, b1=b1, g1=g1, be1=be1, w2=w2, b2=b2)
        return fused_full_layer(
            h, edge_attr, params, deg, adj.T, seed, node_mask, k=k,
            dropout_p=self.dropout, deterministic=deterministic,
            interpret=jax.default_backend() != "tpu")

    def _fused_stream(self, h, edge_attr, t_proj, s_proj, adj,
                      deterministic: bool):
        """Edge stream via the fused Pallas kernel: per-graph
        (ops/fused_edge.py) for 2-D inputs, batch-folded
        (ops/fused_edge_batched.py) for a leading graph-batch axis — the
        lane-folded kernel runs B graphs per grid step at full matmul
        width instead of vmap's B small grids."""
        from nbody_gnn_hpc_tpu.ops.fused_edge import fused_edge_layer
        from nbody_gnn_hpc_tpu.ops.fused_edge_batched import \
            fused_edge_layer_batched

        n_nodes = h.shape[-2]
        k = edge_attr.shape[-2] // n_nodes
        w_e = _DenseKernel(self.hidden_dim, edge_attr.shape[-1],
                           name="edge_proj_attr")()
        gamma, beta = _LayerNormParams(self.hidden_dim, name="edge_norm")()
        training = (not deterministic) and self.dropout > 0
        if training:
            seed = jax.random.randint(
                self.make_rng("dropout"), (1, 1), 0, 2_147_483_647,
                dtype=jnp.int32)
        else:
            seed = jnp.zeros((1, 1), jnp.int32)
        fn = fused_edge_layer_batched if h.ndim == 3 else fused_edge_layer
        return fn(
            t_proj.astype(self.dtype), s_proj.astype(self.dtype),
            edge_attr, w_e, gamma, beta, adj.T, seed, k=k,
            dropout_p=self.dropout, deterministic=deterministic,
            interpret=jax.default_backend() != "tpu")


def resolve_edge_impl(edge_impl: str, gather_mode: str, n_nodes: int,
                      edge_index, backend: Optional[str] = None) -> str:
    """Resolve ``edge_impl="auto"`` to "fused" or "xla".

    Fused requires the row-regular edge layout — the same precondition as
    ``gather_mode="matmul"`` — so "auto" respects an explicit
    ``gather_mode="take"`` (the documented arbitrary-edge escape hatch),
    and verifies the layout outright when the edge set is concrete.  Under
    jit the edges are tracers — there the "matmul" contract applies
    (make_train_step validates it on the concrete edge set before tracing).
    """
    if edge_impl != "auto":
        return edge_impl
    if (backend or jax.default_backend()) != "tpu":
        return "xla"
    e = edge_index.shape[1]
    if e % n_nodes or gather_mode != "matmul":
        return "xla"
    if not isinstance(edge_index, jax.core.Tracer):
        from nbody_gnn_hpc_tpu.ops.knn import is_row_regular
        if not is_row_regular(edge_index, n_nodes):
            return "xla"
    return "fused"


class NBodyGNN(nn.Module):
    """GNN predicting the next state as current_state + delta
    (parity: ``model.py:68-170``)."""

    node_input_dim: int = 7    # pos(3) + vel(3) + mass(1)
    hidden_dim: int = 128
    n_layers: int = 3
    output_dim: int = 6        # delta pos(3) + delta vel(3)
    dropout: float = 0.1
    remat: bool = True         # rematerialize interaction layers in backward
    dtype: Any = jnp.float32   # matmul compute dtype (bfloat16 for MXU rate)
    # Per-edge gather strategy. "matmul" (default) is scatter/gather-free —
    # measured 25% faster end-to-end on the v5e train step (28.1 -> 21.0 ms)
    # because the gathers' backward scatters leave the VPU for the MXU. It
    # requires the row-regular edge layout every builder in ops/knn.py
    # emits (row == repeat(arange(N), k)); make_train_step validates this
    # on concrete edge sets. "take" works for arbitrary edge_index.
    gather_mode: str = "matmul"
    # Edge-stream implementation: "xla" (gather_mode above), "fused" (one
    # Pallas kernel per edge stream, ops/fused_edge.py), "fused_full" (the
    # WHOLE layer as one kernel, ops/fused_edge_full.py — measured negative
    # result, kept opt-in; see its docstring), or "auto" (fused on TPU when
    # shapes allow, else xla). Fused cut the production train step
    # 21.3 -> 12.7 ms on v5e (b24, dropout+noise active).
    edge_impl: str = "auto"

    @nn.compact
    def __call__(self, x, edge_index, pos=None, deterministic: bool = True):
        """Args:
            x: (N, node_input_dim) node features [norm_pos, norm_vel,
               norm_mass] — or (B, N, node_input_dim) for the native-batch
               path (edge_impl "fused" only: the batch-folded Pallas kernel,
               ops/fused_edge_batched.py; all other blocks are last-dim ops
               that batch transparently).
            edge_index: (2, E) int32 [source row, target col].
            pos: (N, 3) positions for edge features; defaults to x[:, :3]
                 (reference model.py:153-156).
            deterministic: disables dropout (eval mode).

        Returns: (N, output_dim) predicted next state.
        """
        current_state = x[..., :6]
        if pos is None:
            pos = x[..., :3]
        if x.ndim == 3:  # batched edge features: (B, E, 5)
            edge_attr = jax.vmap(edge_features, in_axes=(0, None))(
                pos, edge_index)
        else:
            edge_attr = edge_features(pos, edge_index)  # shared by layers
        # One-hot target adjacency + in-degree, shared by all layers (and,
        # under vmap, by the whole batch — it depends only on the static
        # edge set).
        adj, deg = target_adjacency(edge_index, x.shape[-2], self.dtype)

        h = _MLPBlock(self.hidden_dim, self.hidden_dim, self.dropout,
                      dtype=self.dtype, name="node_encoder")(x, deterministic)

        # Remat: each interaction layer's edge intermediates are O(E * 2H)
        # (~400 MB/layer at the production batch) — recompute them in the
        # backward pass instead of keeping all n_layers alive (HBM is the
        # bottleneck; the recompute FLOPs are cheap — SURVEY §7 / the
        # jax.checkpoint recipe).
        # static_argnums counts self at 0: deterministic is arg 4.
        layer_cls = (nn.remat(ParticleInteractionLayer, static_argnums=(4,))
                     if self.remat else ParticleInteractionLayer)
        edge_impl = resolve_edge_impl(self.edge_impl, self.gather_mode,
                                      x.shape[-2], edge_index)
        if x.ndim == 3 and edge_impl != "fused":
            raise ValueError(
                "native-batch (B, N, F) inputs require the fused edge "
                "implementation; use forward_batch (which vmaps the XLA "
                "branches) instead")
        for i in range(self.n_layers):
            h_new = layer_cls(
                node_features=self.hidden_dim, hidden_dim=self.hidden_dim,
                dropout=self.dropout, dtype=self.dtype,
                gather_mode=self.gather_mode, edge_impl=edge_impl,
                name=f"layer_{i}")(
                    h, edge_index, edge_attr, deterministic, adj, deg)
            h = nn.LayerNorm(name=f"norm_{i}")(h + h_new)

        # Decoder (model.py:111-122) with zero-init final layer (the final
        # Dense stays float32 so the residual delta is added at full
        # precision).
        d = nn.Dense(self.hidden_dim, dtype=self.dtype, name="decoder_0")(h)
        d = nn.silu(d.astype(jnp.float32))
        d = nn.Dropout(self.dropout, deterministic=deterministic)(d)
        d = nn.Dense(self.hidden_dim // 2, dtype=self.dtype,
                     name="decoder_1")(d)
        d = nn.silu(d.astype(jnp.float32))
        delta = nn.Dense(self.output_dim, name="decoder_out",
                         kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.zeros)(d)
        return current_state + delta


def model_from_config(config: dict, dtype_override=None) -> NBodyGNN:
    """Build an NBodyGNN from a persisted ``model_config`` dict
    (``models/config.json`` round-trip).  ``dtype`` is stored as a string;
    inference callers typically override it to float32 — the params are
    float32 either way, so the same checkpoint serves both."""
    cfg = dict(config)
    dtype = dtype_override or cfg.pop("dtype", "float32")
    cfg.pop("dtype", None)
    return NBodyGNN(dtype=jnp.dtype(dtype).type if isinstance(dtype, str)
                    else dtype, **cfg)


def init_model(model: NBodyGNN, rng, n_particles: int, n_edges: int):
    """Initialize parameters with dummy shapes; returns the params pytree."""
    x = jnp.zeros((n_particles, model.node_input_dim), jnp.float32)
    e = jnp.zeros((2, n_edges), jnp.int32)
    return model.init({"params": rng}, x, e, deterministic=True)["params"]


def count_parameters(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))


def forward_batch(model: NBodyGNN, params, x, edge_index, pos=None,
                  deterministic: bool = True, dropout_rng=None,
                  native_batch: bool = False):
    """Batched forward over a dense (B, N, F) batch with a shared static
    edge set — the TPU-native replacement for PyG's flattened Batch
    collation (``train.py:182-184``), vmapping the single-graph forward.

    ``native_batch=True`` (fused-edge models only) routes through ONE
    model application on (B, N, F) whose edge stream is the batch-folded
    Pallas kernel (ops/fused_edge_batched.py). MEASURED NEGATIVE RESULT,
    kept as an opt-in building block: on the v5e the b24 train step ties
    the vmapped per-graph kernel (13.99 vs 13.95 ms) and LOSES at b96
    (77.0 vs 48.1 ms) — the edge stream is elementwise/transcendental-
    bound on the VPU (per-graph kernel already at ~35% MXU utilization,
    serialized with the VPU work), so folding graphs into matmul lanes
    buys nothing, and the wide zt materialization + scratch round-trip
    cost grows with batch. See benchmarks/bench_edge_widths.py.
    """
    if pos is None:
        pos = x[..., :3]
    if native_batch and x.ndim == 3 and resolve_edge_impl(
            model.edge_impl, model.gather_mode, x.shape[-2],
            edge_index) == "fused":
        rngs = ({"dropout": dropout_rng} if dropout_rng is not None
                else None)
        return model.apply({"params": params}, x, edge_index, pos,
                           deterministic=deterministic, rngs=rngs)

    def single(xb, posb, rng):
        rngs = {"dropout": rng} if rng is not None else None
        return model.apply({"params": params}, xb, edge_index, posb,
                           deterministic=deterministic, rngs=rngs)

    if dropout_rng is not None:
        rngs = jax.random.split(dropout_rng, x.shape[0])
        return jax.vmap(single)(x, pos, rngs)
    return jax.vmap(lambda xb, posb: single(xb, posb, None))(x, pos)
