"""Device-mesh construction and data-parallel sharding.

The reference's only parallelism is single-process `nn.DataParallel` with
`batch_size *= n_gpus` (processor_v2.py:167-172).  The TPU-native equivalent
is one `jax.sharding.Mesh` with a `data` axis: the batch is sharded across
the axis, parameters/optimizer state are replicated, and XLA inserts the
gradient all-reduce (psum) over ICI inside the jitted train step — the same
semantics, deterministic, and scaling to multi-host DCN unchanged.

Models here are small (~1-10M params), so replicated params + sharded batch
is the right layout; `shard_params` exists for experiments with larger
variants.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict[str, Any], mesh: Mesh, axis_name: str = "data"):
    """Place a host batch onto the mesh, sharded along the batch dimension.
    Batch size must be divisible by the mesh size."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate_state(state, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), state)


def data_parallel_step(step_fn, mesh: Mesh, axis_name: str = "data"):
    """Wrap a jitted step(state, batch, rng, **static) for mesh execution.

    With NamedSharding-annotated inputs, jit partitions automatically: the
    batch stays sharded, state stays replicated, and cross-device gradient
    reduction compiles to XLA all-reduce over ICI.
    """
    rep = replicated(mesh)
    shard = batch_sharding(mesh, axis_name)

    def wrapped(state, batch, rng, **static):
        state = jax.tree.map(
            lambda x: x if _is_sharded(x, mesh) else jax.device_put(x, rep), state
        )
        batch = jax.tree.map(
            lambda x: x if _is_sharded(x, mesh) else jax.device_put(x, shard), batch
        )
        return step_fn(state, batch, rng, **static)

    return wrapped


def _is_sharded(x, mesh: Mesh) -> bool:
    try:
        return getattr(x, "sharding", None) is not None and x.sharding.mesh == mesh
    except Exception:
        return False


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None):
    """Multi-host bring-up: call once per host before creating meshes.

    On a real pod slice this wires DCN coordination (jax.distributed) so the
    same Mesh code spans hosts; a no-op on single-process setups. The
    reference has no multi-process story at all (SURVEY §2.7).

    Demonstrated (not just argued): tests/test_multihost.py spawns two real
    processes over localhost, forms the global mesh through this function
    and runs one sharded GAN train step with gloo collectives."""
    if num_processes in (None, 1):
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def shard_batch_across_hosts(batch: dict[str, Any], mesh: Mesh,
                             axis_name: str = "data"):
    """Multi-host version of shard_batch: each process passes its LOCAL
    shard of the batch (rows process_index*per_host:(process_index+1)*
    per_host of the global batch) and gets back global arrays sharded on
    `axis_name`. Single-process meshes fall through to shard_batch."""
    if jax.process_count() == 1:
        return shard_batch(batch, mesh, axis_name)
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)),
        batch,
    )


# --------------------------------------------------------------------------
# 2-D mesh: data + model axes
# --------------------------------------------------------------------------

def make_mesh_2d(n_data: int, n_model: int, devices=None) -> Mesh:
    """(data, model) mesh. The models here are small enough that pure DP is
    optimal (SURVEY §2.7), but the embedding tables (fastText vocab x 300 —
    the bulk of the parameters) shard cleanly over a 'model' axis; this mesh
    exercises that hybrid layout (and is what dryrun_multichip compiles)."""
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= n_data * n_model
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def shard_params_2d(tree, mesh: Mesh, min_rows: int = 1024,
                    tp_min_cols: int | None = None):
    """Shard large 2-D tables row-wise over 'model'; replicate the rest.

    Row-sharding an embedding table is safe under jit: gathers become
    all-gather-free partial lookups + collective combine, inserted by XLA.

    With `tp_min_cols` set, wide 2-D kernels (Linear (in, out), GRU/LSTM
    gate matrices (cin, n_gates*H)) whose column count is >= tp_min_cols
    and divisible by the 'model' axis are additionally COLUMN-sharded
    (tensor parallelism): each device owns a contiguous slice of output
    features, XLA partitions the matmul over output columns and inserts
    the all-gather/reduce-scatter where a consumer needs the full feature
    axis (gate slicing, elementwise recurrence). Semantics are identical
    to the replicated layout by GSPMD construction — pinned against the
    single-device step in tests/test_mesh_2d.py and __graft_entry__'s
    dryrun. Row-sharding (embeddings) wins the tie: a table that
    qualifies for both stays row-sharded, because embedding lookups touch
    rows, not columns.
    """
    rep = NamedSharding(mesh, P())
    row_sharded = NamedSharding(mesh, P("model", None))
    col_sharded = NamedSharding(mesh, P(None, "model"))
    n_model = mesh.shape["model"]

    def place(x):
        if not hasattr(x, "ndim") or x.ndim != 2:
            return jax.device_put(x, rep)
        if x.shape[0] >= min_rows and x.shape[0] % n_model == 0:
            return jax.device_put(x, row_sharded)
        if tp_min_cols is not None and x.shape[1] >= tp_min_cols \
                and x.shape[1] % n_model == 0:
            return jax.device_put(x, col_sharded)
        return jax.device_put(x, rep)

    return jax.tree.map(place, tree)
