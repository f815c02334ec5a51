"""Device (JAX) connected components for the PUG graph, batched over
cells.

The reference finds weakly connected components of the per-cell UMI
graph with a union-find (pugutils.rs:278-301) — inherently sequential.
The TPU-native equivalent (SURVEY.md §7.1) is iterative **min-label
propagation with pointer jumping**: every node starts labeled with its
own index; each round takes the min over its neighbors' labels and then
hops to its current label's label (path halving), converging to the
minimum node index of its component in O(log N) rounds.  All cells run
in one jitted ``lax.while_loop`` over a padded (B, N, D) neighbor
tensor, so thousands of per-cell PUGs resolve in a single XLA program;
sharding the batch axis over a mesh needs no cross-cell collectives.

The production parsimony path uses the threaded native resolver (49x
the per-cell Python path on host; docs/architecture.md) — this kernel
is the device-resident building block for scaling PUG resolution onto
chips, validated against the host union-find in tests and exercised by
the multi-chip dryrun.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def pack_adjacency(
    adjs: Sequence[Sequence[Sequence[int]]],
    n_nodes: Sequence[int] | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Pack per-cell adjacency lists into the padded (B, N, D) neighbor
    tensor ``connected_components_batched`` consumes.

    ``adjs[b][v]`` lists the neighbors of node ``v`` in cell ``b``
    (directions as stored by the PUG builder are fine — the packer
    symmetrizes).  Invalid neighbor slots and nodes beyond a cell's
    count are padded with ``N`` (the per-batch node capacity).
    Returns (nbrs int32 (B, N, D), node_valid bool (B, N)).
    """
    B = len(adjs)
    counts = (
        [len(a) for a in adjs] if n_nodes is None else [int(n) for n in n_nodes]
    )
    N = max(counts, default=0)
    sym: List[List[set]] = []
    D = 1
    for a in adjs:
        s = [set() for _ in range(len(a))]
        for v, nb in enumerate(a):
            for w in nb:
                s[v].add(int(w))
                s[int(w)].add(v)
        sym.append(s)
        for v in range(len(a)):
            D = max(D, len(s[v]))
    nbrs = np.full((B, max(N, 1), D), max(N, 1), np.int32)
    node_valid = np.zeros((B, max(N, 1)), bool)
    for b, s in enumerate(sym):
        node_valid[b, : counts[b]] = True
        for v in range(counts[b]):
            row = sorted(s[v]) if v < len(s) else []
            nbrs[b, v, : len(row)] = row
    return nbrs, node_valid


def connected_components_batched(
    nbrs: np.ndarray,
    node_valid: np.ndarray,
    mesh=None,
    fixed_rounds: int = 0,
):
    """Min-label-propagation connected components, batched over cells.

    ``nbrs`` is (B, N, D) int32 with neighbor indices in ``[0, N)`` and
    ``N`` marking empty slots (adjacency must be symmetric — use
    ``pack_adjacency``); ``node_valid`` is (B, N) bool.  Returns a
    (B, N) int32 array where each valid node holds the minimum node
    index of its weakly connected component (the canonical component
    id) and invalid nodes hold ``N``.

    With ``mesh`` given, the batch axis is sharded over the mesh — the
    loop is purely node-local per cell, so no collectives are inserted.
    """
    import jax
    import jax.numpy as jnp

    B, N, D = nbrs.shape
    INF = np.int32(N)

    @jax.jit
    def run(nbrs, node_valid):
        init = jnp.where(
            node_valid,
            jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], (B, N)),
            INF,
        )
        flat_nbrs = nbrs.reshape(B, N * D)

        def gather(ext, idx):
            return jnp.take_along_axis(ext, idx, axis=1)

        def body(state):
            labels, _ = state
            ext = jnp.concatenate(
                [labels, jnp.full((B, 1), INF, jnp.int32)], axis=1
            )
            neigh = gather(ext, flat_nbrs).reshape(B, N, D)
            new = jnp.minimum(labels, jnp.min(neigh, axis=2))
            # pointer jumping (path halving): hop to the label's label
            ext2 = jnp.concatenate(
                [new, jnp.full((B, 1), INF, jnp.int32)], axis=1
            )
            new = jnp.minimum(new, gather(ext2, new))
            return new, jnp.any(new != labels)

        if fixed_rounds > 0:
            # profiling variant: exactly ``fixed_rounds`` propagation
            # rounds in one dispatch (see scripts/profile_kernels.py)
            labels, _ = jax.lax.fori_loop(
                0, fixed_rounds, lambda _i, s: body(s),
                (init, jnp.bool_(True)),
            )
        else:
            labels, _ = jax.lax.while_loop(
                lambda s: s[1], body, (init, jnp.bool_(True))
            )
        return labels

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        shard = NamedSharding(mesh, P(mesh.axis_names[0]))
        nbrs = jax.device_put(jnp.asarray(nbrs, jnp.int32), shard)
        node_valid = jax.device_put(jnp.asarray(node_valid), shard)
    else:
        nbrs = jnp.asarray(nbrs, jnp.int32)
        node_valid = jnp.asarray(node_valid)
    return np.asarray(run(nbrs, node_valid))
