"""Canonicalization: distributed union-find over surface-form alias graphs.

The wide section of the KG pipeline (north_rule). The alias table
(entity_id, aliases[list]) induces a bipartite graph between surface
nodes (``s:<surface>``) and entity nodes (``e:<entity_id>``); entities
sharing a surface form must collapse into one cluster, and every
surface must map to its cluster's **canonical id = min entity_id**
(deterministic, independent of partitioning / parallelism — the
reference gets determinism from single-threaded file order, we get it
from the min-reduction).

Algorithm: iterated min-label propagation (hash-to-min family) built
from ``groupby`` shuffles only — two exchanges per round, each the
size of the (dimension-scale) alias graph, never corpus-sized:

  round:  (labels ∪ directed-edges) groupby(node) -> forward my label
          to every neighbor + to myself; then groupby(node) -> new
          label = min(messages), count changes.

Convergence in O(graph diameter) rounds; the driver loop stops when
the change count hits zero (the change counter is a tiny aggregate,
not a materialization of the data).

Applying the mapping to the corpus-sized mention/triple stream is a
**broadcast hash join** (``ray.put`` once, probe per batch with
``pc.index_in``), mirroring the reference's broadcast-dict joins
(/root/reference/biocypher_metta/adapters/tflink_adapter.py:42-44)
— drop-on-miss, with dropped counts surfaced. For gazetteers too large
to broadcast, use stages/joins.py's partitioned hash join keyed on
surface with salting instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


# ---------------------------------------------------------------------------
# Alias graph construction
# ---------------------------------------------------------------------------

def alias_edges(entities_ds: ray.data.Dataset) -> ray.data.Dataset:
    """(entity_id, aliases: list<string>) -> (surface, entity_id) edges."""

    def explode(batch: pa.Table) -> pa.Table:
        aliases = batch["aliases"]
        if isinstance(aliases, pa.ChunkedArray):
            aliases = aliases.combine_chunks()
        lengths = pc.list_value_length(aliases).to_numpy(zero_copy_only=False)
        idx = pa.array(np.repeat(np.arange(len(batch), dtype=np.int64), lengths))
        return pa.table(
            {
                "surface": aliases.flatten(),
                "entity_id": batch["entity_id"].take(idx),
            }
        )

    return entities_ds.map_batches(explode, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Distributed connected components (min-label propagation)
# ---------------------------------------------------------------------------

def prefix_bipartite_edges(edges: ray.data.Dataset) -> ray.data.Dataset:
    """(surface, entity_id) -> namespaced (src, dst) string edges
    (``s:``/``e:`` prefixes keep the two id spaces disjoint)."""

    def both(batch: pa.Table) -> pa.Table:
        def _cat(prefix, col):
            out = pc.binary_join_element_wise(
                pa.array([prefix] * len(col)), col.cast(pa.string()), ""
            )
            return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out

        return pa.table(
            {
                "src": _cat("s:", batch["surface"]),
                "dst": _cat("e:", batch["entity_id"]),
            }
        )

    return edges.map_batches(both, batch_format="pyarrow")


def _initial_labels(edges: ray.data.Dataset) -> ray.data.Dataset:
    from .skew import partitioned_group_map

    def init(batch: pa.Table) -> pa.Table:
        def _cc(col):
            return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col

        node = pa.concat_arrays([_cc(batch["src"]), _cc(batch["dst"])])
        return pa.table({"node": node, "label": node})

    labeled = edges.map_batches(init, batch_format="pyarrow")
    return partitioned_group_map(
        labeled, ["node"], lambda g: g.drop_duplicates(subset=["node"]), 8
    )


def _directed_edges(edges: ray.data.Dataset) -> ray.data.Dataset:
    def both(batch: pa.Table) -> pa.Table:
        def _cc(col):
            return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col

        return pa.table(
            {
                "node": pa.concat_arrays([_cc(batch["src"]), _cc(batch["dst"])]),
                "neighbor": pa.concat_arrays([_cc(batch["dst"]), _cc(batch["src"])]),
            }
        )

    return edges.map_batches(both, batch_format="pyarrow")


def _local_union_find(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-side union-find with path compression; component id =
    min node string of the component (same contract as the distributed
    path, exact for any graph shape/diameter)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(df["src"], df["dst"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = pd.unique(pd.concat([df["src"], df["dst"]], ignore_index=True))
    return pd.DataFrame(
        {"node": nodes, "component": [find(n) for n in nodes]}
    )


def connected_components(
    edges: ray.data.Dataset,
    max_iter: int = 25,
    strict: bool = True,
    local_threshold: int = 2_000_000,
) -> ray.data.Dataset:
    """Generic undirected connected components over (src, dst) string
    edges -> (node, component), component = min node-id of the
    component.

    Size-adaptive: the edge list is materialized once (it is the
    already-reduced pair/alias graph, never the corpus) and counted.
    Below ``local_threshold`` edges a driver-side union-find answers
    exactly in one pass — paying O(diameter) distributed min-label
    rounds (2 shuffles/round) for a dimension-scale graph is pure
    overhead. Above the threshold the distributed min-label loop runs;
    it is deterministic for any partition count (every reduction is a
    min). Pass ``local_threshold=0`` to force the distributed path.

    Convergence (distributed path): min-label needs O(component
    diameter) rounds. If labels are still changing after ``max_iter``
    rounds the result would be WRONG for long chains, so ``strict``
    (default) raises; ``strict=False`` downgrades to a metrics counter
    + RuntimeWarning.
    """
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        # Ray 2.49 to_pandas() on a 0-row dataset drops the columns
        # (see grouped_agg's identical guard): a dup-free corpus is a
        # legitimate input, so return the typed empty, don't KeyError.
        return ray.data.from_pandas(
            pd.DataFrame({"node": pd.Series([], dtype="object"),
                          "component": pd.Series([], dtype="object")})
        )
    if local_threshold and n_edges <= local_threshold:
        df = edges.to_pandas()
        return ray.data.from_pandas(_local_union_find(df))

    labels = _initial_labels(edges)
    directed = _directed_edges(edges)  # static across rounds

    from .skew import partitioned_group_map

    changed = 0
    for _ in range(max_iter):
        lab_part = labels.map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "payload": t["label"],
                    "kind": pa.array(["L"] * len(t), pa.string()),
                }
            ),
            batch_format="pyarrow",
        )
        edge_part = directed.map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "payload": t["neighbor"],
                    "kind": pa.array(["E"] * len(t), pa.string()),
                }
            ),
            batch_format="pyarrow",
        )

        def forward(g: pd.DataFrame) -> pd.DataFrame:
            # vectorized over the whole hash partition: current label
            # per node, forwarded to every neighbor + back to self
            lab = g[g["kind"] == "L"][["node", "payload"]].rename(
                columns={"payload": "label"}
            )
            lab = lab.groupby("node", sort=False)["label"].min().reset_index()
            ed = g[g["kind"] == "E"][["node", "payload"]]
            fwd = ed.merge(lab, on="node")[["payload", "label"]].rename(
                columns={"payload": "node"}
            )
            fwd["is_self"] = False
            slf = lab.copy()
            slf["is_self"] = True
            return pd.concat([fwd, slf], ignore_index=True)

        msgs = partitioned_group_map(
            lab_part.union(edge_part), ["node"], forward, 16
        )

        def reduce_min(g: pd.DataFrame) -> pd.DataFrame:
            agg = g.groupby("node", sort=False).agg(
                label=("label", "min")
            )
            old = (
                g[g["is_self"]]
                .groupby("node", sort=False)["label"]
                .min()
                .rename("old")
            )
            out = agg.join(old).reset_index()
            out["changed"] = (out["label"] != out["old"]).astype("int64")
            return out[["node", "label", "changed"]]

        new_labels = partitioned_group_map(msgs, ["node"], reduce_min, 16)
        new_labels = new_labels.materialize()
        changed = new_labels.sum("changed")
        labels = new_labels.drop_columns(["changed"])
        if not changed:
            break
    if changed:
        from ..state.metrics import incr

        incr("connected_components", "nonconverged_labels", int(changed))
        msg = (
            f"connected_components did not converge after {max_iter} "
            f"rounds ({changed} labels still changing) — component ids "
            "for diameter>max_iter chains would be wrong; raise max_iter"
        )
        if strict:
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)

    return labels.map_batches(
        lambda t: pa.table({"node": t["node"], "component": t["label"]}),
        batch_format="pyarrow",
    )


def canonical_mapping(entities_ds: ray.data.Dataset, max_iter: int = 25) -> ray.data.Dataset:
    """entities table -> (surface, canonical_id) mapping dataset.

    canonical_id = min entity_id of the surface's connected component.
    """
    edges = prefix_bipartite_edges(alias_edges(entities_ds))
    cc = connected_components(edges, max_iter=max_iter)

    def elect(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized across components within the partition:
        # canonical = min e:-node per component, emitted per s:-node
        is_e = g["node"].str.startswith("e:")
        canon = (
            g[is_e]
            .assign(canonical_id=lambda d: d["node"].str[2:])
            .groupby("component", sort=False)["canonical_id"]
            .min()
            .reset_index()
        )
        surf = g[~is_e].assign(surface=lambda d: d["node"].str[2:])
        out = surf.merge(canon, on="component")
        return out[["surface", "canonical_id"]]

    from .skew import partitioned_group_map

    return partitioned_group_map(cc, ["component"], elect, 16)


# ---------------------------------------------------------------------------
# Broadcast application (corpus-sized side)
# ---------------------------------------------------------------------------

class CanonicalizeTriples:
    """Actor-pool stage: map subj/obj surfaces -> canonical ids.

    ``mapping_ref`` is a ``ray.put`` object ref of the small
    (surface -> canonical_id) dict — shipped to each actor ONCE, not
    per batch. Rows whose subject or object surface misses the map are
    dropped (inner-join drop-on-miss) and counted in ``self.dropped``.
    """

    def __init__(self, mapping_ref):
        mapping: dict[str, str] = ray.get(mapping_ref) if not isinstance(mapping_ref, dict) else mapping_ref
        self.surfaces = pa.array(sorted(mapping), type=pa.string())
        self.canon = pa.array(
            [mapping[s] for s in sorted(mapping)], type=pa.string()
        )
        self.dropped = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        si = pc.index_in(batch["subj_surface"], self.surfaces)
        oi = pc.index_in(batch["obj_surface"], self.surfaces)
        valid = pc.and_(si.is_valid(), oi.is_valid())
        n_valid = pc.sum(valid.cast(pa.int64())).as_py() or 0
        self.dropped += len(batch) - n_valid
        batch = batch.append_column("subj", self.canon.take(si)).append_column(
            "obj", self.canon.take(oi)
        )
        out = batch.filter(valid)
        return out.drop_columns(["subj_surface", "obj_surface"])
