"""Iterative graph algorithms over distributed edge lists.

The reference ships its node/edge output downstream and never ranks
it; a KG built at corpus scale needs importance scoring on the graph
itself (hub detection feeds entity-link priors and dedup of head
entities — see stages/canonicalize.py). PageRank is the canonical
such algorithm and the canonical *iterative* Ray Data workload: a
static, fact-scale edge table re-joined each sweep against a
node-scale rank frontier.

Shape per iteration (the 100 TB contract):

- the weighted edge table ``(src, dst, w=1/out_deg)`` is computed
  ONCE and materialized — iterations re-read its blocks from the
  object store, nothing is re-derived;
- each sweep is one bounded-partition hash join (edges x ranks on
  ``src``) producing ``(dst, rank*w)`` contributions, pre-summed per
  partition before a node-scale groupby — the classic
  partial-aggregate-before-shuffle shape;
- the rank frontier is node-scale (dimension-sized relative to the
  edge table) and is materialized per sweep so sweep ``k`` does not
  re-execute sweeps ``1..k-1`` through lazy recomputation.

Convention: damping ``d``, uniform teleport ``(1-d)/N``; mass of
dangling nodes (no out-edges) is NOT redistributed — ranks then sum
to < 1, which is irrelevant for ranking/thresholding and keeps the
sweep a single join (the redistribution variant needs an extra
global scalar per sweep). Documented so the SQL oracle states the
same recurrence.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from .skew import partitioned_group_map


def pagerank(
    edges: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 5,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Fixed-iteration PageRank over an ``(src, dst)`` edge Dataset.

    Duplicate edges are collapsed first (multiplicity is a property of
    extraction, not topology). Returns ``(node, pr)`` with ``pr``
    rounded to 6 decimals — summation order across partitions is not
    deterministic, so the stable contract is the rounded value (same
    rule as every float oracle in this repo).
    """
    e = edges.select_columns([src, dst])

    def dd(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    # distinct edges: per-batch dedup, then co-locate by src so the
    # out-degree weight can be attached in the same pass
    def weight(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates([src, dst])
        deg = g.groupby(src, sort=False)[dst].transform("size")
        return pd.DataFrame(
            {src: g[src], dst: g[dst], "w": 1.0 / deg.to_numpy()}
        )

    weighted = partitioned_group_map(
        e.map_batches(dd, batch_format="pandas"), [src], weight,
        num_partitions,
    ).materialize()

    nodes = partitioned_group_map(
        e.map_batches(
            lambda df: pd.DataFrame(
                {"node": pd.concat([df[src], df[dst]]).drop_duplicates()}
            ),
            batch_format="pandas",
        ),
        ["node"],
        lambda g: g.drop_duplicates(),
        num_partitions,
        coalesce=2 * num_partitions,
    ).materialize()
    n = nodes.count()
    teleport = (1.0 - damping) / n

    ranks = nodes.map_batches(
        lambda df: df.assign(pr=np.float64(1.0 / n)), batch_format="pandas"
    ).materialize()

    for _ in range(iterations):
        def tag(side, cols):
            def fn(df: pd.DataFrame) -> pd.DataFrame:
                out = df[cols].copy()
                out["__side"] = side
                return out

            return fn

        both = weighted.map_batches(
            tag("E", [src, dst, "w"]), batch_format="pandas"
        ).union(
            ranks.map_batches(
                lambda df: df.rename(columns={"node": src})[[src, "pr"]]
                .assign(__side="R"),
                batch_format="pandas",
            )
        )

        def contrib(g: pd.DataFrame) -> pd.DataFrame:
            ew = g[g["__side"] == "E"][[src, dst, "w"]]
            r = g[g["__side"] == "R"][[src, "pr"]]
            m = ew.merge(r, on=src)
            if not len(m):
                return pd.DataFrame({"node": pd.Series([], dtype=object),
                                     "c": pd.Series([], dtype="float64")})
            # partial-sum per dst inside the partition before the
            # node-scale shuffle
            s = (m["w"].to_numpy() * m["pr"].to_numpy())
            out = (
                pd.DataFrame({"node": m[dst], "c": s})
                .groupby("node", sort=False)["c"].sum().reset_index()
            )
            return out

        contribs = partitioned_group_map(
            both, [src], contrib, num_partitions, coalesce=2 * num_partitions
        )

        # node-scale: attach summed contributions to the full node
        # list (nodes with no in-edges keep bare teleport mass)
        nboth = nodes.map_batches(
            lambda df: df.assign(c=np.float64(0.0)), batch_format="pandas"
        ).union(contribs)

        def newrank(g: pd.DataFrame) -> pd.DataFrame:
            s = g.groupby("node", sort=False)["c"].sum()
            return pd.DataFrame(
                {"node": s.index, "pr": teleport + damping * s.to_numpy()}
            )

        ranks = partitioned_group_map(
            nboth, ["node"], newrank, num_partitions,
            coalesce=2 * num_partitions,
        ).materialize()

    return ranks.map_batches(
        lambda df: df.assign(pr=df["pr"].round(6)), batch_format="pandas"
    )
