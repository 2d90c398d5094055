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
    weight_col: str | None = None,
    seed_nodes: list | None = None,
) -> ray.data.Dataset:
    """Fixed-iteration PageRank over an ``(src, dst)`` edge Dataset.

    Unweighted (default): duplicate edges are collapsed first
    (multiplicity is a property of extraction, not topology) and each
    out-edge carries ``1/out_degree``. With ``weight_col``: duplicate
    (src, dst) rows SUM their weights (additive per-batch partials,
    final sum in the co-location) and each edge carries
    ``w / out_weight_sum`` — mention-count-strength propagation.
    Returns ``(node, pr)`` rounded to 6 decimals — summation order
    across partitions is not deterministic, so the stable contract is
    the rounded value (same rule as every float oracle in this repo).
    """
    cols = [src, dst] + ([weight_col] if weight_col else [])
    e = edges.select_columns(cols)

    def dd(df: pd.DataFrame) -> pd.DataFrame:
        if weight_col:
            return df.groupby([src, dst], sort=False,
                              as_index=False)[weight_col].sum()
        return df.drop_duplicates()

    # collapsed edges: per-batch partial, then co-locate by src so
    # the out-degree/out-weight normalizer attaches in the same pass
    def weight(g: pd.DataFrame) -> pd.DataFrame:
        if weight_col:
            g = g.groupby([src, dst], sort=False,
                          as_index=False)[weight_col].sum()
            tot = g.groupby(src, sort=False)[weight_col].transform(
                "sum"
            ).to_numpy(dtype=np.float64)
            return pd.DataFrame(
                {src: g[src], dst: g[dst],
                 "w": g[weight_col].to_numpy(dtype=np.float64) / tot}
            )
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
    if seed_nodes is not None:
        # personalized: teleport mass and the initial distribution
        # concentrate on the seed set (Jeh & Widom 2003); everything
        # else in the sweep is unchanged. Seed set is dimension-scale
        # and broadcast once.
        seeds = set(seed_nodes)
        if not seeds:
            raise ValueError("personalized pagerank needs >= 1 seed")
        seeds_ref = ray.put(seeds)
        t_seed = (1.0 - damping) / len(seeds)
        r_seed = 1.0 / len(seeds)

        def init(df: pd.DataFrame) -> pd.DataFrame:
            s = ray.get(seeds_ref)
            return df.assign(
                pr=np.where(df["node"].isin(s), np.float64(r_seed),
                            np.float64(0.0))
            )

        def teleport_of(node_series: pd.Series) -> np.ndarray:
            s = ray.get(seeds_ref)
            return np.where(node_series.isin(s), t_seed, 0.0)

        ranks = nodes.map_batches(init, batch_format="pandas").materialize()
    else:
        teleport = (1.0 - damping) / n
        teleport_of = None
        ranks = nodes.map_batches(
            lambda df: df.assign(pr=np.float64(1.0 / n)),
            batch_format="pandas",
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
                return pd.DataFrame(
                    {"node": ew[dst].iloc[:0],
                     "c": pd.Series([], dtype="float64")}
                )
            # partial-sum per dst inside the partition before the
            # node-scale shuffle
            s = (m["w"].to_numpy() * m["pr"].to_numpy())
            out = (
                pd.DataFrame({"node": m[dst], "c": s})
                .groupby("node", sort=False)["c"].sum().reset_index()
            )
            return out

        # no coalesce here: `both` contains the FACT-scale edge table
        # every sweep, and coalesce is an extra full pass (it is for
        # small intermediates only — skew.py docstring)
        contribs = partitioned_group_map(
            both, [src], contrib, num_partitions
        )

        # node-scale: attach summed contributions to the full node
        # list (nodes with no in-edges keep bare teleport mass)
        nboth = nodes.map_batches(
            lambda df: df.assign(c=np.float64(0.0)), batch_format="pandas"
        ).union(contribs)

        def newrank(g: pd.DataFrame) -> pd.DataFrame:
            s = g.groupby("node", sort=False)["c"].sum()
            t = (teleport_of(s.index.to_series())
                 if teleport_of is not None else teleport)
            return pd.DataFrame(
                {"node": s.index, "pr": t + damping * s.to_numpy()}
            )

        ranks = partitioned_group_map(
            nboth, ["node"], newrank, num_partitions,
            coalesce=2 * num_partitions,
        ).materialize()

    return ranks.map_batches(
        lambda df: df.assign(pr=df["pr"].round(6)), batch_format="pandas"
    )


def _oriented_graph(
    edges: ray.data.Dataset,
    src: str,
    dst: str,
    num_partitions: int,
) -> tuple[ray.data.Dataset, ray.data.Dataset, object]:
    """Shared front half of the wedge-join family (triangle count,
    per-edge neighbor similarity): collapse an edge Dataset to the
    canonical UNDIRECTED simple graph, attach both endpoint degrees,
    and orient every edge from its lower-``(degree, node)`` endpoint
    to the higher — each node's oriented out-degree is O(sqrt(m)), so
    downstream wedge emission is bounded at O(m^1.5) even on a
    power-law graph whose raw hub degrees would make naive
    neighbor-pairing quadratic.

    Returns ``(oriented, with_deg, deg, ntype)``: ``oriented`` rows are
    ``(s, d, ds, dd)`` (both degrees carried so callers can credit
    third-vertex weights), ``with_deg`` is the canonical edge list
    ``(u, v, du, dv)`` with ``u < v``, ``deg`` the node-degree table
    ``(node, deg)``, and ``ntype`` the node dtype.
    """
    from .joins import _pd_dtypes

    ntype = _pd_dtypes(edges.select_columns([src]))[src]

    und = partitioned_group_map(
        edges.select_columns([src, dst]).map_batches(
            lambda df: pd.DataFrame(
                {
                    "u": np.minimum(df[src], df[dst]),
                    "v": np.maximum(df[src], df[dst]),
                }
            )[lambda d: d["u"] != d["v"]].drop_duplicates(),
            batch_format="pandas",
        ),
        ["u"],
        lambda g: g.drop_duplicates(),
        num_partitions,
    ).materialize()

    deg = partitioned_group_map(
        und.map_batches(
            lambda df: pd.concat(
                [df["u"].rename("node"), df["v"].rename("node")]
            ).to_frame(),
            batch_format="pandas",
        ),
        ["node"],
        lambda g: g.groupby("node", sort=False).size().reset_index(name="deg"),
        num_partitions,
        coalesce=2 * num_partitions,
    ).materialize()

    def attach(col, out, ecols):
        def tag_e(df):
            df = df.copy()
            df["__side"] = "E"
            return df

        def tag_d(df):
            return df.rename(columns={"node": col, "deg": out}).assign(
                __side="D"
            )

        def body(g):
            # reindex, not column-select: a group whose range block
            # came entirely from the degree side (a node that only
            # ever appears on the OTHER endpoint) lacks the edge
            # columns outright
            e = g[g["__side"] == "E"].reindex(columns=ecols)
            d = g[g["__side"] == "D"].reindex(columns=[col, out])
            d = d.dropna(subset=[col])
            d[out] = d[out].astype("int64")
            m = e.merge(d, on=col)
            # undo the union-concat NaN-fill upcast on BOTH endpoint
            # columns: a float64 node key hashes into a different
            # partition than the same int64 key and silently drops
            # rows in the NEXT attach/close stage (joins._pd_dtypes
            # bug class)
            for c in ("u", "v"):
                m[c] = m[c].astype(ntype)
            return m

        return tag_e, tag_d, body

    e1t, d1t, b1 = attach("u", "du", ["u", "v"])
    with_du = partitioned_group_map(
        und.map_batches(e1t, batch_format="pandas").union(
            deg.map_batches(d1t, batch_format="pandas")
        ),
        ["u"], b1, num_partitions, coalesce=2 * num_partitions,
    )
    e2t, d2t, b2 = attach("v", "dv", ["u", "v", "du"])
    with_deg = partitioned_group_map(
        with_du.map_batches(e2t, batch_format="pandas").union(
            deg.map_batches(d2t, batch_format="pandas")
        ),
        ["v"], b2, num_partitions, coalesce=2 * num_partitions,
    ).materialize()

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        # orientation key (deg, node): ties broken by node id, so the
        # order is total and both directions agree everywhere
        u_first = (df["du"].to_numpy() < df["dv"].to_numpy()) | (
            (df["du"].to_numpy() == df["dv"].to_numpy())
            & (df["u"].to_numpy() < df["v"].to_numpy())
        )
        return pd.DataFrame(
            {
                "s": np.where(u_first, df["u"], df["v"]),
                "d": np.where(u_first, df["v"], df["u"]),
                "ds": np.where(u_first, df["du"], df["dv"]).astype("int64"),
                "dd": np.where(u_first, df["dv"], df["du"]).astype("int64"),
            }
        )

    # every output is consumed by MULTIPLE downstream co-locations
    # (wedges + closing edges + final join): materialize each once —
    # the pagerank static-edge-table contract — or every consumer
    # re-executes the whole upstream extraction pipeline through
    # Ray's lazy recomputation (measured 90 s -> seconds on the KG
    # graph queries at bench scale)
    oriented = with_deg.map_batches(
        orient, batch_format="pandas"
    ).materialize()
    return oriented, with_deg, deg, ntype


def triangle_count(
    edges: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Exact triangle count of the UNDIRECTED simple graph underlying
    an edge Dataset (direction and multiplicity collapsed, self-loops
    dropped). Returns a one-row frame ``(n_triangles)``.

    Degree-oriented wedge join (the standard distributed shape): every
    edge is oriented from its lower-``(degree, node)`` endpoint to the
    higher, so each triangle is counted exactly once from its
    smallest-key vertex and — the scale property — every node's
    oriented out-degree is O(sqrt(m)), bounding wedge emission at
    O(m^1.5) total even on a power-law graph whose raw hub degrees
    would make naive neighbor-pairing quadratic. Three bounded
    shuffles (attach degree to each endpoint, co-locate wedges with
    closing edges); per-partition counts sum on the driver (one int
    per partition).
    """
    oriented, _with_deg, _deg, _ntype = _oriented_graph(
        edges, src, dst, num_partitions
    )

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, grp in g.groupby("s", sort=False):
            n = len(grp)
            if n < 2:
                continue
            # neighbors in orientation-key order so each wedge's pair
            # is itself oriented and can close on an oriented edge
            nb = grp.sort_values(["dd", "d"], kind="mergesort")[
                "d"
            ].to_numpy()
            i, j = np.triu_indices(n, k=1)
            outs.append(pd.DataFrame({"w1": nb[i], "w2": nb[j]}))
        if not outs:
            # empty frame with the NODE dtype, not object — blocks of
            # an int-keyed graph must unify to one schema
            return pd.DataFrame({"w1": g["d"].iloc[:0],
                                 "w2": g["d"].iloc[:0]})
        return pd.concat(outs, ignore_index=True)

    w = partitioned_group_map(oriented, ["s"], wedges, num_partitions)

    def tag_w(df):
        df = df.copy()
        df["__side"] = "W"
        return df

    def tag_close(df):
        return df.rename(columns={"s": "w1", "d": "w2"})[["w1", "w2"]].assign(
            __side="C"
        )

    def close(g: pd.DataFrame) -> pd.DataFrame:
        closing = g[g["__side"] == "C"][["w1", "w2"]].drop_duplicates()
        ww = g[g["__side"] == "W"][["w1", "w2"]]
        n = len(ww.merge(closing, on=["w1", "w2"]))
        return pd.DataFrame({"n": [np.int64(n)]})

    parts = partitioned_group_map(
        w.map_batches(tag_w, batch_format="pandas").union(
            oriented.map_batches(tag_close, batch_format="pandas")
        ),
        ["w1", "w2"], close, num_partitions,
    ).to_pandas()
    return pd.DataFrame({"n_triangles": [np.int64(parts["n"].sum())]})


def neighbor_similarity(
    edges: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-edge link-prediction scores over the undirected simple
    graph: for every canonical edge ``(u < v)`` the common-neighbor
    count, neighbor-set Jaccard ``|N(u) ∩ N(v)| / |N(u) ∪ N(v)|``
    (``= common / (deg(u) + deg(v) - common)`` by inclusion-exclusion
    on a simple graph) and Adamic-Adar ``Σ_w 1 / ln(deg(w))`` over the
    common neighbors ``w`` (every such ``w`` touches both endpoints,
    so ``deg(w) >= 2`` and the log never vanishes). The standard KG
    entity-dedup / missing-edge prior (Liben-Nowell & Kleinberg 2003).

    Scale shape: a common neighbor of an EDGE is exactly a triangle
    through it, so this rides :func:`_oriented_graph`'s degree-
    oriented wedge join — O(m^1.5) wedge bound, no hub blowup. Each
    closed triangle emits three credit rows (each edge credited with
    the third vertex's ``1/ln(deg)``); credits aggregate per edge in
    one bounded co-location and left-join back onto the degree-
    carrying edge list, so triangle-free edges score zeros. Floats
    round to 6 (the repo's oracle-parity convention).
    """
    oriented, with_deg, _deg, ntype = _oriented_graph(
        edges, src, dst, num_partitions
    )

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for s, grp in g.groupby("s", sort=False):
            n = len(grp)
            if n < 2:
                continue
            grp = grp.sort_values(["dd", "d"], kind="mergesort")
            nb = grp["d"].to_numpy()
            nd = grp["dd"].to_numpy()
            dc = np.int64(grp["ds"].iloc[0])
            i, j = np.triu_indices(n, k=1)
            outs.append(pd.DataFrame({
                "w1": nb[i], "w2": nb[j],
                "dw1": nd[i], "dw2": nd[j],
                "c": s, "dc": dc,
            }))
        if not outs:
            return pd.DataFrame({
                "w1": g["d"].iloc[:0], "w2": g["d"].iloc[:0],
                "dw1": pd.Series([], dtype="int64"),
                "dw2": pd.Series([], dtype="int64"),
                "c": g["s"].iloc[:0],
                "dc": pd.Series([], dtype="int64"),
            })
        return pd.concat(outs, ignore_index=True)

    w = partitioned_group_map(oriented, ["s"], wedges, num_partitions)

    def tag_w(df):
        df = df.copy()
        df["__side"] = "W"
        return df

    def tag_close(df):
        return df.rename(columns={"s": "w1", "d": "w2"})[["w1", "w2"]].assign(
            __side="C"
        )

    def close(g: pd.DataFrame) -> pd.DataFrame:
        closing = g[g["__side"] == "C"].reindex(
            columns=["w1", "w2"]).dropna(subset=["w1"]).drop_duplicates()
        ww = g[g["__side"] == "W"].reindex(
            columns=["w1", "w2", "dw1", "dw2", "c", "dc"])
        # undo the union-concat NaN-fill upcast on the one-sided
        # center column: a float64 node id would poison the credit
        # keys' hash partitioning downstream (joins._pd_dtypes class)
        ww["c"] = ww["c"].astype(ntype)
        tri = ww.merge(closing, on=["w1", "w2"])
        if tri.empty:
            return pd.DataFrame({
                "u": g["w1"].iloc[:0].astype(ntype),
                "v": g["w1"].iloc[:0].astype(ntype),
                "inv": pd.Series([], dtype="float64"),
            })
        w1 = tri["w1"].to_numpy()
        w2 = tri["w2"].to_numpy()
        c = tri["c"].to_numpy()
        dw1 = tri["dw1"].to_numpy(dtype=np.float64)
        dw2 = tri["dw2"].to_numpy(dtype=np.float64)
        dc = tri["dc"].to_numpy(dtype=np.float64)
        # one triangle (c, w1, w2) credits all three of its edges
        # with the THIRD vertex's inverse-log degree
        return pd.DataFrame({
            "u": np.concatenate([np.minimum(w1, w2), np.minimum(c, w1),
                                 np.minimum(c, w2)]),
            "v": np.concatenate([np.maximum(w1, w2), np.maximum(c, w1),
                                 np.maximum(c, w2)]),
            "inv": np.concatenate([1.0 / np.log(dc), 1.0 / np.log(dw2),
                                   1.0 / np.log(dw1)]),
        })

    credits = partitioned_group_map(
        w.map_batches(tag_w, batch_format="pandas").union(
            oriented.map_batches(tag_close, batch_format="pandas")
        ),
        ["w1", "w2"], close, num_partitions,
    )

    def agg_body(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby(["u", "v"], sort=False).agg(
            common=("inv", "size"), aa=("inv", "sum")
        ).reset_index()
        a["common"] = a["common"].astype("int64")
        return a

    creds = partitioned_group_map(credits, ["u", "v"], agg_body,
                                  num_partitions)

    def tag_e(df):
        df = df.copy()
        df["__side"] = "E"
        return df

    def tag_s(df):
        df = df.copy()
        df["__side"] = "S"
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["__side"] == "E"].reindex(columns=["u", "v", "du", "dv"])
        for col, dt in (("u", ntype), ("v", ntype),
                        ("du", "int64"), ("dv", "int64")):
            e[col] = e[col].astype(dt)
        s = g[g["__side"] == "S"].reindex(columns=["u", "v", "common", "aa"])
        for col in ("u", "v"):
            s[col] = s[col].astype(ntype)
        m = e.merge(s, on=["u", "v"], how="left")
        common = m["common"].fillna(0).astype("int64")
        denom = (m["du"] + m["dv"] - common).to_numpy(dtype=np.float64)
        return pd.DataFrame({
            "u": m["u"], "v": m["v"],
            "common_neighbors": common,
            "jaccard": np.round(common.to_numpy(np.float64) / denom, 6),
            "adamic_adar": m["aa"].fillna(0.0).round(6).astype("float64"),
        })

    return partitioned_group_map(
        with_deg.map_batches(tag_e, batch_format="pandas").union(
            creds.map_batches(tag_s, batch_format="pandas")
        ),
        ["u", "v"], final, num_partitions,
    )


def clustering_coefficient(
    edges: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-node local clustering coefficient over the undirected
    simple graph: ``coeff = 2 * triangles(v) / (deg(v) * (deg(v)-1))``
    (0 for degree-<2 nodes) — the classic community-density signal
    (Watts & Strogatz 1998); on a KG it separates tight co-mention
    cliques from star-shaped hub entities at equal degree.

    Scale shape: same :func:`_oriented_graph` wedge join as
    :func:`triangle_count` (O(m^1.5) wedge bound); each closed
    triangle credits its three VERTICES once, credits pre-sum per
    partition (node-scale partials) before one node-keyed
    co-location, then left-join onto the degree table so
    triangle-free nodes score zero. Returns ``(node, degree,
    triangles, coeff)`` with ``coeff`` rounded to 6.
    """
    oriented, _with_deg, deg, ntype = _oriented_graph(
        edges, src, dst, num_partitions
    )

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for s, grp in g.groupby("s", sort=False):
            n = len(grp)
            if n < 2:
                continue
            nb = grp.sort_values(["dd", "d"], kind="mergesort")[
                "d"
            ].to_numpy()
            i, j = np.triu_indices(n, k=1)
            outs.append(pd.DataFrame({"w1": nb[i], "w2": nb[j], "c": s}))
        if not outs:
            return pd.DataFrame({
                "w1": g["d"].iloc[:0], "w2": g["d"].iloc[:0],
                "c": g["s"].iloc[:0],
            })
        return pd.concat(outs, ignore_index=True)

    w = partitioned_group_map(oriented, ["s"], wedges, num_partitions)

    def tag_w(df):
        df = df.copy()
        df["__side"] = "W"
        return df

    def tag_close(df):
        return df.rename(columns={"s": "w1", "d": "w2"})[["w1", "w2"]].assign(
            __side="C"
        )

    def close(g: pd.DataFrame) -> pd.DataFrame:
        closing = g[g["__side"] == "C"].reindex(
            columns=["w1", "w2"]).dropna(subset=["w1"]).drop_duplicates()
        ww = g[g["__side"] == "W"].reindex(columns=["w1", "w2", "c"])
        ww["c"] = ww["c"].astype(ntype)
        tri = ww.merge(closing, on=["w1", "w2"])
        if tri.empty:
            return pd.DataFrame({
                "node": g["w1"].iloc[:0].astype(ntype),
                "t": pd.Series([], dtype="int64"),
            })
        # each triangle credits its three vertices once; pre-sum the
        # partition's credits so the node-scale shuffle ships partials
        nodes = pd.concat([tri["w1"], tri["w2"], tri["c"]],
                          ignore_index=True)
        out = nodes.value_counts().rename_axis("node").reset_index(
            name="t")
        out["t"] = out["t"].astype("int64")
        return out

    parts = partitioned_group_map(
        w.map_batches(tag_w, batch_format="pandas").union(
            oriented.map_batches(tag_close, batch_format="pandas")
        ),
        ["w1", "w2"], close, num_partitions,
    )

    def tag_d(df):
        df = df.copy()
        df["__side"] = "D"
        return df

    def tag_t(df):
        df = df.copy()
        df["__side"] = "T"
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        d = g[g["__side"] == "D"].reindex(columns=["node", "deg"])
        d["node"] = d["node"].astype(ntype)
        d["deg"] = d["deg"].astype("int64")
        t = g[g["__side"] == "T"].reindex(columns=["node", "t"])
        t["node"] = t["node"].astype(ntype)
        t = t.groupby("node", sort=False)["t"].sum().reset_index()
        m = d.merge(t, on="node", how="left")
        tri = m["t"].fillna(0).astype("int64")
        dv = m["deg"].to_numpy(dtype=np.float64)
        denom = dv * (dv - 1.0)
        coeff = np.where(denom > 0, 2.0 * tri.to_numpy(np.float64)
                         / np.where(denom > 0, denom, 1.0), 0.0)
        return pd.DataFrame({
            "node": m["node"], "degree": m["deg"],
            "triangles": tri, "coeff": np.round(coeff, 6),
        })

    return partitioned_group_map(
        deg.map_batches(tag_d, batch_format="pandas").union(
            parts.map_batches(tag_t, batch_format="pandas")
        ),
        ["node"], final, num_partitions,
    )


def sssp_distances(
    edges: ray.data.Dataset,
    seeds: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    weight_col: str | None = None,
    sweeps: int = 4,
    directed: bool = False,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """WEIGHTED bounded-sweep shortest paths (Bellman-Ford): distance
    of every node reachable from the seed set within ``sweeps`` edges,
    minimizing summed edge cost (``weight_col``; 1.0 per edge when
    None, which degrades to hop-count BFS). On a mention-weighted KG
    with cost = 1/co-occurrence this is association proximity — the
    "how tightly is X tied to the seed entity" query hop-count BFS
    cannot answer. Parallel edges collapse to their MINIMUM cost.

    Scale shape per sweep (the pagerank contract): the cost-collapsed
    edge table is built ONCE and materialized; each sweep is one
    edge-keyed bounded co-location (edges x current distances on the
    source) emitting per-partition MIN partials, then one node-scale
    min-merge against the previous distances, materialized so sweep k
    never recomputes sweeps 1..k-1. Fixed ``sweeps`` (no early exit)
    so the SQL oracle is the same unrolled chain. min() is
    order-independent and each path's cost folds left along the
    sweep, so results are float-deterministic; rounded to 6 on
    output by convention. Returns ``(node, dist)`` — nodes beyond
    ``sweeps`` edges are absent.
    """
    from .joins import _pd_dtypes

    ntype = _pd_dtypes(edges.select_columns([src]))[src]

    def to_cost(df: pd.DataFrame) -> pd.DataFrame:
        w = (df[weight_col].to_numpy(dtype=np.float64) if weight_col
             else np.ones(len(df), dtype=np.float64))
        out = pd.DataFrame({"u": df[src], "v": df[dst], "w": w})
        if not directed:
            out = pd.concat(
                [out, pd.DataFrame({"u": df[dst], "v": df[src], "w": w})],
                ignore_index=True,
            )
        return out

    ew = partitioned_group_map(
        edges.map_batches(to_cost, batch_format="pandas"),
        ["u"],
        lambda g: g.groupby(["u", "v"], sort=False)["w"].min().reset_index(),
        num_partitions,
    ).materialize()

    dists = seeds.map_batches(
        lambda df: pd.DataFrame({"node": df[seed_col],
                                 "dist": np.float64(0.0)}),
        batch_format="pandas",
    ).materialize()

    def tag(side):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__side"] = side
            return df

        return fn

    def relax(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["__side"] == "E"].reindex(columns=["u", "v", "w"])
        r = g[g["__side"] == "R"].reindex(columns=["u", "dist"]).dropna(
            subset=["u"])
        m = e.merge(r, on="u")
        if m.empty:
            return pd.DataFrame({
                "node": e["v"].iloc[:0].astype(ntype),
                "dist": pd.Series([], dtype="float64"),
            })
        cand = m["dist"].to_numpy(np.float64) + m["w"].to_numpy(np.float64)
        # per-partition min partial before the node-scale merge
        out = (
            pd.DataFrame({"node": m["v"], "dist": cand})
            .groupby("node", sort=False)["dist"].min().reset_index()
        )
        out["node"] = out["node"].astype(ntype)
        return out

    def min_merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.reindex(columns=["node", "dist"])
        out = g.groupby("node", sort=False)["dist"].min().reset_index()
        out["node"] = out["node"].astype(ntype)
        return out

    for _ in range(sweeps):
        both = ew.map_batches(tag("E"), batch_format="pandas").union(
            dists.map_batches(
                lambda df: df.rename(columns={"node": "u"})[["u", "dist"]]
                .assign(__side="R"),
                batch_format="pandas",
            )
        )
        cands = partitioned_group_map(both, ["u"], relax, num_partitions)
        dists = partitioned_group_map(
            dists.union(cands), ["node"], min_merge, num_partitions,
            coalesce=2 * num_partitions,
        ).materialize()

    return dists.map_batches(
        lambda df: pd.DataFrame({"node": df["node"],
                                 "dist": df["dist"].round(6)}),
        batch_format="pandas",
    )


def degree_assortativity(
    edges: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Degree assortativity of the undirected simple graph: Pearson
    correlation of endpoint degrees over the SYMMETRIZED edge list
    (each undirected edge contributes both ``(du, dv)`` and
    ``(dv, du)`` — Newman 2002). Positive = hubs attach to hubs
    (social-network shape); negative = hubs attach to leaves
    (star/biological shape) — the one-scalar topology fingerprint.

    Scale shape: rides :func:`_oriented_graph`'s degree-carrying edge
    list; the correlation is five float partial sums per block
    (n, Σx, Σy, Σxx(==Σyy by symmetry), Σxy) reduced on the driver —
    zero additional shuffles beyond the degree attach. Returns a
    one-row frame ``(assortativity)`` rounded to 6 (NaN-safe: 0-variance
    degenerate graphs return NULL/NaN like SQL ``corr``).
    """
    _oriented, with_deg, _deg, _ntype = _oriented_graph(
        edges, src, dst, num_partitions
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df["du"].to_numpy(dtype=np.float64)
        y = df["dv"].to_numpy(dtype=np.float64)
        # symmetrize: each edge counted in both directions
        xs = np.concatenate([x, y])
        ys = np.concatenate([y, x])
        return pd.DataFrame({
            "n": [np.float64(xs.size)],
            "sx": [xs.sum()], "sy": [ys.sum()],
            "sxx": [(xs * xs).sum()], "syy": [(ys * ys).sum()],
            "sxy": [(xs * ys).sum()],
        })

    p = with_deg.map_batches(partial, batch_format="pandas").to_pandas()
    n = p["n"].sum()
    if n == 0:
        return pd.DataFrame({"assortativity": [np.nan]})
    sx, sy = p["sx"].sum(), p["sy"].sum()
    cov = p["sxy"].sum() - sx * sy / n
    vx = p["sxx"].sum() - sx * sx / n
    vy = p["syy"].sum() - sy * sy / n
    denom = np.sqrt(vx * vy)
    r = cov / denom if denom > 0 else np.nan
    return pd.DataFrame({"assortativity": [np.round(r, 6)]})


def bfs_distances(
    edges: ray.data.Dataset,
    seeds: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    max_hops: int = 3,
    directed: bool = False,
    num_partitions: int = 16,
    broadcast_frontier: bool = False,
) -> ray.data.Dataset:
    """Shortest-path hop distances from a seed set, bounded at
    ``max_hops`` — k-hop neighborhood expansion (the "context
    subgraph around an entity of interest" query a KG serves; the
    reference leaves graph traversal to its downstream MeTTa runtime,
    /root/reference/metta_generator.py ships facts and nothing else).

    Two modes, the canonicalize.py size-adaptive convention:

    ``broadcast_frontier=True`` — for graphs whose NODE set is
    dimension-scale (the KG entity graph): frontier and visited sets
    live on the driver and broadcast via ``ray.put``; each hop is ONE
    stateless streaming pass over the adjacency blocks with ZERO
    shuffles (no setup co-location either — block-local dedup
    suffices, the driver dedupes nodes). The fact-scale adjacency is
    never sorted or shuffled at all.

    ``broadcast_frontier=False`` (default) — fully distributed for
    billion-node graphs: adjacency co-locates by ``src`` once, each
    sweep joins the frontier in that partitioning and subtracts the
    visited set in a single node-keyed co-location. Costs one
    fact-scale sort per hop (Ray Data does not retain partitioning
    metadata between operations), so prefer the broadcast mode
    whenever the node set fits driver memory.

    Early-exits when a frontier empties. Returns ``(node, dist)``
    with int64 ``dist`` = hop count (seeds at 0); nodes beyond
    ``max_hops`` are absent.
    """
    e = edges.select_columns([src, dst])
    if not directed:
        e = e.union(
            edges.select_columns([dst, src]).map_batches(
                lambda df: df.rename(columns={dst: "__t", src: dst})
                .rename(columns={"__t": src})[[src, dst]],
                batch_format="pandas",
            )
        )

    if broadcast_frontier:
        adjb = e.map_batches(
            lambda df: df.drop_duplicates(), batch_format="pandas"
        ).materialize()
        seeds_pd = seeds.to_pandas()
        seed_vals = (
            seeds_pd[seed_col].drop_duplicates().tolist()
            if len(seeds_pd) else []
        )
        visited = set(seed_vals)
        frames = [pd.DataFrame({"node": seed_vals,
                                "dist": np.int64(0)})]
        frontier = set(seed_vals)
        for h in range(1, max_hops + 1):
            if not frontier:
                break
            f_ref = ray.put(frontier)

            def step(df: pd.DataFrame) -> pd.DataFrame:
                f = ray.get(f_ref)
                return pd.DataFrame(
                    {"node": df.loc[df[src].isin(f), dst]
                     .drop_duplicates()}
                )

            cand = adjb.map_batches(
                step, batch_format="pandas"
            ).to_pandas()
            if cand.empty:
                break
            new = [
                n for n in cand["node"].drop_duplicates()
                if n not in visited
            ]
            if not new:
                break
            visited.update(new)
            frames.append(
                pd.DataFrame({"node": new, "dist": np.int64(h)})
            )
            frontier = set(new)
        return ray.data.from_pandas(
            pd.concat(frames, ignore_index=True)
        )

    adj = partitioned_group_map(
        e.map_batches(
            lambda df: df.drop_duplicates(), batch_format="pandas"
        ),
        [src],
        lambda g: g.drop_duplicates([src, dst]),
        num_partitions,
    ).materialize()

    dist = seeds.map_batches(
        lambda df: pd.DataFrame(
            {"node": df[seed_col].drop_duplicates(),
             "dist": np.int64(0)}
        ),
        batch_format="pandas",
    ).materialize()
    frontier = dist.select_columns(["node"])

    for h in range(1, max_hops + 1):
        # frontier rows carry a placeholder dst (= their own node) so
        # the union's frames share one schema: a missing column would
        # NaN-fill in the partition concat and upcast integer node
        # ids to float, silently breaking hash co-location (the
        # joins._pd_dtypes hazard)
        both = adj.map_batches(
            lambda df: df[[src, dst]].assign(__side="E"),
            batch_format="pandas",
        ).union(
            frontier.map_batches(
                lambda df: pd.DataFrame(
                    {src: df["node"], dst: df["node"], "__side": "F"}
                ),
                batch_format="pandas",
            )
        )

        def step(g: pd.DataFrame) -> pd.DataFrame:
            ew = g[g["__side"] == "E"]
            f = g[g["__side"] == "F"]
            hit = ew[ew[src].isin(set(f[src]))]
            return pd.DataFrame({"node": hit[dst].drop_duplicates()})

        nbrs = partitioned_group_map(both, [src], step, num_partitions)

        vboth = nbrs.map_batches(
            lambda df: df.assign(__side="N"), batch_format="pandas"
        ).union(
            dist.map_batches(
                lambda df: pd.DataFrame(
                    {"node": df["node"], "__side": "V"}
                ),
                batch_format="pandas",
            )
        )

        def unseen(g: pd.DataFrame) -> pd.DataFrame:
            seen = set(g.loc[g["__side"] == "V", "node"])
            out = g.loc[g["__side"] == "N", ["node"]]
            return out[~out["node"].isin(seen)].drop_duplicates()

        new = (
            partitioned_group_map(
                vboth, ["node"], unseen, num_partitions,
                coalesce=2 * num_partitions,
            )
            .map_batches(
                lambda df, _h=h: df.assign(dist=np.int64(_h)),
                batch_format="pandas",
            )
            .materialize()
        )
        if new.count() == 0:
            break
        dist = dist.union(new).materialize()
        frontier = new.select_columns(["node"])

    return dist


def hits(
    edges: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Fixed-iteration HITS (Kleinberg 1999, the *other* classic link
    analysis next to PageRank — hubs point at good authorities,
    authorities are pointed at by good hubs) over a directed
    ``(src, dst)`` edge Dataset. Duplicate edges collapse first, same
    convention as :func:`pagerank`.

    Recurrence, stated so the SQL oracle unrolls the SAME chain:
    ``hub_0 = 1`` on every node; per sweep ``auth_k(v) =
    sum(hub_{k-1}(u) for u->v)`` L2-normalized over all nodes, then
    ``hub_k(u) = sum(auth_k(v) for u->v)`` L2-normalized. Nodes
    missing a contribution hold 0 (kept in the frontier, unlike the
    dangling-mass drop in PageRank, because normalization needs the
    full vector).

    Scale shape: the distinct edge table is materialized ONCE and
    re-joined each half-sweep (the pagerank static-edge-table
    contract); each half-sweep is one bounded co-location join with
    per-partition partial sums before the node-scale reduce, plus ONE
    O(1) driver scalar (the squared norm, itself a partial-sum
    aggregate). Returns ``(node, hub, auth)`` rounded to 6 — the
    stable contract under nondeterministic float summation order.
    """
    e = (
        edges.select_columns([src, dst])
        .map_batches(lambda df: df.drop_duplicates(),
                     batch_format="pandas")
    )
    e = partitioned_group_map(
        e, [src, dst], lambda g: g.drop_duplicates(), num_partitions,
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

    def _half(scores: ray.data.Dataset, join_col: str,
              emit_col: str) -> ray.data.Dataset:
        """One half-sweep: propagate ``scores.v`` across the edge
        table joined on ``join_col``, emitting to ``emit_col``'s
        endpoint, L2-normalized over the full node list."""
        both = e.map_batches(
            lambda df: df[[src, dst]].assign(__side="E"),
            batch_format="pandas",
        ).union(
            scores.map_batches(
                lambda df: df.rename(columns={"node": join_col})[
                    [join_col, "v"]
                ].assign(__side="S"),
                batch_format="pandas",
            )
        )

        def contrib(g: pd.DataFrame) -> pd.DataFrame:
            ew = g[g["__side"] == "E"][[src, dst]]
            s = g[g["__side"] == "S"][[join_col, "v"]]
            m = ew.merge(s, on=join_col)
            if not len(m):
                return pd.DataFrame(
                    {"node": ew[emit_col].iloc[:0],
                     "c": pd.Series([], dtype="float64")}
                )
            return (
                pd.DataFrame({"node": m[emit_col],
                              "c": m["v"].to_numpy(dtype=np.float64)})
                .groupby("node", sort=False)["c"].sum().reset_index()
            )

        contribs = partitioned_group_map(both, [join_col], contrib,
                                         num_partitions)
        nboth = nodes.map_batches(
            lambda df: df.assign(c=np.float64(0.0)),
            batch_format="pandas",
        ).union(contribs)
        raw = partitioned_group_map(
            nboth, ["node"],
            lambda g: g.groupby("node", sort=False, as_index=False)[
                "c"].sum().rename(columns={"c": "v"}),
            num_partitions, coalesce=2 * num_partitions,
        ).materialize()
        ss = raw.map_batches(
            lambda df: pd.DataFrame(
                {"ss": [np.square(df["v"].to_numpy(
                    dtype=np.float64)).sum()]}
            ),
            batch_format="pandas",
        ).sum("ss")
        norm = float(np.sqrt(ss)) if ss and ss > 0 else 1.0
        return raw.map_batches(
            lambda df: df.assign(v=df["v"].to_numpy(
                dtype=np.float64) / norm),
            batch_format="pandas",
        ).materialize()

    hub = nodes.map_batches(
        lambda df: df.assign(v=np.float64(1.0)), batch_format="pandas"
    ).materialize()
    auth = hub
    for _ in range(iterations):
        auth = _half(hub, src, dst)   # auth(v) <- sum hub(u), u->v
        hub = _half(auth, dst, src)   # hub(u) <- sum auth(v), u->v

    both = hub.map_batches(
        lambda df: df.assign(__side="H"), batch_format="pandas"
    ).union(
        auth.map_batches(
            lambda df: df.assign(__side="A"), batch_format="pandas"
        )
    )

    def pivot(g: pd.DataFrame) -> pd.DataFrame:
        h = g[g["__side"] == "H"][["node", "v"]].rename(
            columns={"v": "hub"})
        a = g[g["__side"] == "A"][["node", "v"]].rename(
            columns={"v": "auth"})
        out = h.merge(a, on="node", how="outer")
        out["hub"] = out["hub"].fillna(0.0).round(6)
        out["auth"] = out["auth"].fillna(0.0).round(6)
        return out

    return partitioned_group_map(both, ["node"], pivot, num_partitions,
                                 coalesce=2 * num_partitions)


def k_core(
    edges: ray.data.Dataset,
    k: int = 2,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 6,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """k-core of the undirected simple graph by iterative peeling:
    repeatedly drop nodes of degree < ``k`` (and their edges) until a
    fixpoint or ``max_rounds`` peels. Semantics are stated as "the
    graph after ``max_rounds`` peeling rounds" so the SQL oracle can
    unroll the SAME bounded chain — on any graph where peeling
    converges within ``max_rounds`` (checked: the loop exits early at
    the fixpoint, and extra unrolled SQL rounds are no-ops there) this
    IS the exact k-core. Returns ``(node, deg)`` — surviving nodes
    with their within-core degree (one final ``>= k`` filter applied
    identically on both sides).

    Scale shape: the symmetrized edge table is materialized once per
    round (it SHRINKS monotonically — each round's table feeds both
    the degree count and the next filter, the lazy-recompute lesson);
    each round is one degree co-location + one survivor semi-join per
    endpoint via the tagged-union pattern, all bounded-partition. The
    round count is the documented cap, not a convergence guess: real
    peeling cascades longer than ``max_rounds`` need the cap raised —
    the early-exit makes extra headroom free on converged graphs.
    """
    def sym(df: pd.DataFrame) -> pd.DataFrame:
        fwd = df[[src, dst]].rename(columns={src: "s", dst: "d"})
        rev = df[[dst, src]].rename(columns={dst: "s", src: "d"})
        return pd.concat([fwd, rev], ignore_index=True).drop_duplicates()

    e0 = edges.select_columns([src, dst]).map_batches(
        sym, batch_format="pandas"
    )
    # canonical symmetric simple graph (self-loops dropped: a loop is
    # its own reverse and would double-count degree)
    e = partitioned_group_map(
        e0, ["s", "d"],
        lambda g: g[g["s"] != g["d"]].drop_duplicates(),
        num_partitions,
    ).materialize()

    def degs(t: ray.data.Dataset) -> ray.data.Dataset:
        return partitioned_group_map(
            t, ["s"],
            lambda g: g.groupby("s", sort=False, as_index=False)
            .size().rename(columns={"s": "node", "size": "deg"}),
            num_partitions, coalesce=2 * num_partitions,
        )

    n_edges = e.count()
    for _ in range(max_rounds):
        # materialized: feeds BOTH endpoint semi-joins (the
        # lazy-recompute lesson — two consumers re-execute upstream)
        survivors = degs(e).map_batches(
            lambda df: df[df["deg"] >= k], batch_format="pandas"
        ).materialize()

        def semi(t: ray.data.Dataset, col: str) -> ray.data.Dataset:
            both = t.map_batches(
                lambda df: df.assign(__side="E"), batch_format="pandas"
            ).union(survivors.map_batches(
                lambda df, c=col: pd.DataFrame(
                    {c: df["node"]}).assign(__side="S"),
                batch_format="pandas",
            ))

            def body(g: pd.DataFrame, c=col) -> pd.DataFrame:
                ew = g[g["__side"] == "E"][["s", "d"]]
                keep = g[g["__side"] == "S"][c]
                out = ew[ew[c].isin(set(keep))]
                return out if len(out) else pd.DataFrame(
                    {"s": ew["s"].iloc[:0], "d": ew["d"].iloc[:0]})

            return partitioned_group_map(both, [col], body,
                                         num_partitions)

        e = semi(semi(e, "s"), "d").materialize()
        m = e.count()
        if m == n_edges:
            break
        n_edges = m

    return degs(e).map_batches(
        lambda df: df[df["deg"] >= k], batch_format="pandas"
    )


def label_propagation(
    edges: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    sweeps: int = 4,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Community detection by synchronous label propagation
    (Raghavan et al. 2007, made deterministic): every node starts
    labeled with its own id; each sweep it adopts the most frequent
    label among its neighbors, ties broken by MINIMUM label. A fixed
    ``sweeps`` count (not run-to-convergence — synchronous LPA can
    oscillate on bipartite structure) with the whole recurrence in
    integers, so the SQL oracle unrolls the SAME chain with exact
    equality, no float rounding contract needed.

    Scale shape: the symmetrized simple edge table is materialized
    once (static across sweeps); each sweep is one bounded
    co-location join on the label-donor endpoint with per-partition
    ``(node, label)`` partial counts before the node-scale argmax
    reduce. Returns ``(node, label)``.
    """
    def sym(df: pd.DataFrame) -> pd.DataFrame:
        fwd = df[[src, dst]].rename(columns={src: "s", dst: "d"})
        rev = df[[dst, src]].rename(columns={dst: "s", src: "d"})
        return pd.concat([fwd, rev], ignore_index=True).drop_duplicates()

    e = partitioned_group_map(
        edges.select_columns([src, dst]).map_batches(
            sym, batch_format="pandas"),
        ["s", "d"],
        lambda g: g[g["s"] != g["d"]].drop_duplicates(),
        num_partitions,
    ).materialize()

    labels = partitioned_group_map(
        e.map_batches(
            lambda df: pd.DataFrame({"node": df["s"].drop_duplicates()}),
            batch_format="pandas",
        ),
        ["node"],
        lambda g: g.drop_duplicates().assign(lab=lambda x: x["node"]),
        num_partitions, coalesce=2 * num_partitions,
    ).materialize()

    for _ in range(sweeps):
        both = e.map_batches(
            lambda df: df.assign(__side="E"), batch_format="pandas"
        ).union(labels.map_batches(
            lambda df: df.rename(columns={"node": "s"})[["s", "lab"]]
            .assign(__side="L"),
            batch_format="pandas",
        ))

        def counts(g: pd.DataFrame) -> pd.DataFrame:
            ew = g[g["__side"] == "E"][["s", "d"]]
            lb = g[g["__side"] == "L"][["s", "lab"]]
            m = ew.merge(lb, on="s")
            if not len(m):
                return pd.DataFrame(
                    {"node": ew["d"].iloc[:0], "lab": ew["d"].iloc[:0],
                     "c": pd.Series([], dtype="int64")}
                )
            return (
                m.groupby(["d", "lab"], sort=False).size()
                .rename("c").reset_index()
                .rename(columns={"d": "node"})
            )

        partial = partitioned_group_map(both, ["s"], counts,
                                        num_partitions)

        def argmax(g: pd.DataFrame) -> pd.DataFrame:
            t = g.groupby(["node", "lab"], sort=False,
                          as_index=False)["c"].sum()
            t = t.sort_values(["c", "lab"],
                              ascending=[False, True], kind="stable")
            return t.drop_duplicates("node")[["node", "lab"]]

        labels = partitioned_group_map(
            partial, ["node"], argmax, num_partitions,
            coalesce=2 * num_partitions,
        ).materialize()

    return labels


def modularity(
    edges: ray.data.Dataset,
    labels: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    label_col: str = "lab",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Newman modularity Q of a node partition over the symmetrized
    simple graph: ``Q = sum_c (e_c/m - (d_c/2m)^2)`` with ``m`` the
    undirected edge count, ``e_c`` the within-community undirected
    edge count and ``d_c`` the community degree sum. The standard
    one-scalar quality score for a community detection result (pair
    it with :func:`label_propagation`).

    Scale shape: degrees come from one co-location over the
    symmetrized edge table; community tagging of each endpoint is two
    tagged-union co-location joins (labels are node-scale); both
    reduce to COMMUNITY-cardinality partial tables whose final
    combine + the Q arithmetic run on the driver (communities are
    dimension-scale by construction — a partition with fact-scale
    community count has no within-edges to score). All counts are
    integers; the single float division happens once at the end, so
    the SQL oracle states the identical formula with exact inputs.
    Returns a 1-row dataset ``(modularity,)`` rounded to 6 decimals.
    """
    def sym(df: pd.DataFrame) -> pd.DataFrame:
        fwd = df[[src, dst]].rename(columns={src: "s", dst: "d"})
        rev = df[[dst, src]].rename(columns={dst: "s", src: "d"})
        return pd.concat([fwd, rev], ignore_index=True).drop_duplicates()

    e = partitioned_group_map(
        edges.select_columns([src, dst]).map_batches(
            sym, batch_format="pandas"),
        ["s", "d"],
        lambda g: g[g["s"] != g["d"]].drop_duplicates(),
        num_partitions,
    ).materialize()

    lab = labels.map_batches(
        lambda df: df.rename(
            columns={node_col: "s", label_col: "lab"})[["s", "lab"]],
        batch_format="pandas",
    )

    def tagged_join(left: ray.data.Dataset, key_out: str
                    ) -> ray.data.Dataset:
        """Co-locate ``left`` (s,d[,lab_s]) with labels on ``s``,
        emit left columns + ``key_out`` = label of s."""
        both = left.map_batches(
            lambda df: df.assign(__side="E"), batch_format="pandas"
        ).union(lab.map_batches(
            lambda df: df.assign(__side="L"), batch_format="pandas"))

        def body(g: pd.DataFrame) -> pd.DataFrame:
            ew = g[g["__side"] == "E"].drop(columns=["__side", "lab"],
                                            errors="ignore")
            lb = g[g["__side"] == "L"][["s", "lab"]].rename(
                columns={"lab": key_out})
            out = ew.merge(lb, on="s")
            return out

        return partitioned_group_map(both, ["s"], body, num_partitions)

    # lab_s on the s endpoint, then flip and tag the d endpoint.
    e1 = tagged_join(e, "lab_s").map_batches(
        lambda df: df.rename(columns={"s": "d", "d": "s"}),
        batch_format="pandas",
    )
    e2 = tagged_join(e1, "lab_d")

    def within_partial(df: pd.DataFrame) -> pd.DataFrame:
        w = df[df["lab_s"] == df["lab_d"]]
        return (w.groupby("lab_s", sort=False).size()
                .rename("n").reset_index()
                .rename(columns={"lab_s": "lab"}))

    within = e2.map_batches(within_partial, batch_format="pandas")

    deg = partitioned_group_map(
        e, ["s"],
        lambda g: g.groupby("s", sort=False).size()
        .rename("k").reset_index(),
        num_partitions,
    )
    dsum = tagged_join(deg, "lab").map_batches(
        lambda df: df.groupby("lab", sort=False)["k"].sum()
        .rename("d").reset_index(),
        batch_format="pandas",
    )

    # community-cardinality partials -> driver finish (see docstring)
    w_pdf = within.to_pandas().groupby("lab")["n"].sum()
    d_pdf = dsum.to_pandas().groupby("lab")["d"].sum()
    m2 = float(e.count())  # = 2m (both directions present)
    if m2 == 0:
        q = float("nan")
    else:
        e_c = w_pdf.reindex(d_pdf.index, fill_value=0).to_numpy(
            dtype="float64")  # within count in BOTH directions = 2*e_c
        d_c = d_pdf.to_numpy(dtype="float64")
        q = float(np.sum(e_c / m2 - (d_c / m2) ** 2))
    return ray.data.from_pandas(
        pd.DataFrame({"modularity": [round(q, 6)]}))


def closeness_centrality(
    edges: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    sweeps: int = 6,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Truncated HARMONIC closeness centrality:
    ``C(v) = sum_{u != v, d(v,u) <= sweeps} 1/d(v,u)`` over the
    symmetrized simple graph — the "how near is everything" score
    that completes the centrality family (degree/PageRank/HITS score
    influence, closeness scores reach). Harmonic form because it is
    well-defined on disconnected graphs (unreached pairs contribute
    0, no 1/inf convention); truncation at ``sweeps`` hops bounds the
    relaxation (stated in the oracle as the same unrolled chain).

    Scale shape: multi-source min-plus relaxation over PAIR state
    ``(source, node, dist)`` — per sweep one bounded co-location of
    the pair frontier with the static materialized edge table plus
    one pair-keyed min-merge, both with per-partition partials.
    PARTITIONING ASSUMPTION (documented per the custom-operator
    rule): pair state is O(n * avg k-hop ball); it is the right tool
    for dimension-scale node sets (entity graphs — the canonical KG
    here), NOT for billion-node graphs where one would sample
    sources (Eppstein-Wang) instead. All-integer distances; the
    single 1/d pass happens at the end, rounded to 6.
    """
    def sym(df: pd.DataFrame) -> pd.DataFrame:
        fwd = df[[src, dst]].rename(columns={src: "s", dst: "d"})
        rev = df[[dst, src]].rename(columns={dst: "s", src: "d"})
        return pd.concat([fwd, rev], ignore_index=True).drop_duplicates()

    e = partitioned_group_map(
        edges.select_columns([src, dst]).map_batches(
            sym, batch_format="pandas"),
        ["s", "d"],
        lambda g: g[g["s"] != g["d"]].drop_duplicates(),
        num_partitions,
    ).materialize()

    pairs = partitioned_group_map(
        e.map_batches(
            lambda df: pd.DataFrame({"node": df["s"].drop_duplicates()}),
            batch_format="pandas",
        ),
        ["node"],
        lambda g: g.drop_duplicates().assign(
            srcn=lambda x: x["node"], dist=np.int64(0)),
        num_partitions, coalesce=2 * num_partitions,
    ).materialize()

    def relax(g: pd.DataFrame) -> pd.DataFrame:
        ew = g[g["__side"] == "E"][["u", "d"]]
        pr = g[g["__side"] == "P"][["u", "srcn", "dist"]]
        m = ew.merge(pr, on="u")
        if not len(m):
            return pd.DataFrame(
                {"srcn": ew["d"].iloc[:0], "node": ew["d"].iloc[:0],
                 "dist": pd.Series([], dtype="int64")})
        out = pd.DataFrame({"srcn": m["srcn"], "node": m["d"],
                            "dist": m["dist"] + np.int64(1)})
        return (out.groupby(["srcn", "node"], sort=False)["dist"]
                .min().reset_index())

    def min_merge(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby(["srcn", "node"], sort=False)["dist"]
                .min().reset_index())

    for _ in range(sweeps):
        both = e.map_batches(
            lambda df: df.rename(columns={"s": "u"}).assign(__side="E"),
            batch_format="pandas",
        ).union(pairs.map_batches(
            lambda df: df.rename(columns={"node": "u"})
            [["u", "srcn", "dist"]].assign(__side="P"),
            batch_format="pandas",
        ))
        cands = partitioned_group_map(both, ["u"], relax, num_partitions)
        pairs = partitioned_group_map(
            pairs.union(cands), ["srcn", "node"], min_merge,
            num_partitions, coalesce=2 * num_partitions,
        ).materialize()

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["dist"] > 0]
        inv = 1.0 / g["dist"].to_numpy(dtype=np.float64)
        out = (g[["srcn"]].assign(__c=inv)
               .groupby("srcn", sort=False, as_index=False)["__c"].sum())
        return pd.DataFrame({"node": out["srcn"],
                             "closeness": out["__c"].round(6)})

    return partitioned_group_map(pairs, ["srcn"], finish, num_partitions)


def ancestor_closure(
    edges: ray.data.Dataset,
    child: str = "child",
    parent: str = "parent",
    max_depth: int = 4,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Bounded transitive closure of a child->parent DAG: every
    (node, ancestor, depth) with depth = MIN hops <= ``max_depth`` —
    the GO/ontology ancestor-closure shape (term enrichment joins a
    fact table against exactly this result; the reference walks the
    same subClassOf chains one OWL node at a time in
    ontologies_adapter.py's in-memory graph).

    Semi-naive evaluation, the datalog-textbook scale shape: sweep d
    joins only the FRONTIER discovered at d-1 (never the whole
    closure) against the static edge table — one bounded hash join —
    then an anti join on the packed (node, ancestor) key prunes pairs
    already reached by a shorter path, so DAGs with many redundant
    paths cannot re-derive (and re-ship) the same pair per path. The
    closure accumulates as a lazy union of per-depth frontiers, each
    materialized once (the pagerank static-table contract). Node ids
    must fit unsigned 32 bits for the pack; asserted per batch.
    """
    from .joins import anti_join, hash_join

    nparts = num_partitions or 16

    # dtype-faithful empty (the _bucket_pairs.empty() discipline): the
    # bucketed join's sort can emit schema-less empty ranges; every
    # map body below returns THIS for them so downstream schema
    # resolution and unions always see the full typed column set
    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {c: pd.Series(dtype="int64")
             for c in ("node", "ancestor", "depth", "__pair")})

    def _pack(df: pd.DataFrame) -> pd.DataFrame:
        node = df["node"].to_numpy(np.int64)
        anc = df["ancestor"].to_numpy(np.int64)
        if len(node):
            hi = max(int(node.max()), int(anc.max()))
            lo = min(int(node.min()), int(anc.min()))
            assert 0 <= lo and hi < (1 << 32), (
                "ancestor_closure packs (node, ancestor) into int64; "
                "ids must be in [0, 2^32)")
        return df.assign(__pair=(node << 32) | anc)

    # depth-1 base level is deduped on the packed pair through the
    # same co-location later frontiers use — duplicate (child, parent)
    # input rows must not violate the documented set semantics
    def _dedup_base(df: pd.DataFrame) -> pd.DataFrame:
        if "__pair" not in df.columns:
            return _empty()
        return df.drop_duplicates("__pair")

    base = partitioned_group_map(
        edges.map_batches(
            lambda df: _pack(pd.DataFrame(
                {"node": df[child].astype("int64"),
                 "ancestor": df[parent].astype("int64"),
                 "depth": np.int64(1)})),
            batch_format="pandas",
        ),
        ["__pair"], _dedup_base, num_partitions=nparts,
    ).materialize()

    # static hop table, reused every sweep
    hop = edges.map_batches(
        lambda df: pd.DataFrame(
            {"ancestor": df[child].astype("int64"),
             "__next": df[parent].astype("int64")}),
        batch_format="pandas",
    ).materialize()

    frontier = base
    levels = [base]
    # lazy union of every discovered pair — KEY COLUMN ONLY, so each
    # sweep's membership co-location ships 8 bytes per known pair,
    # not the full row
    seen = base.select_columns(["__pair"])
    for depth in range(2, max_depth + 1):
        if frontier.count() == 0:
            break
        # use_native=False: the frontier is a partitioned_group_map
        # output whose sort can emit schema-less empty ranges — benign
        # for the bucketed join body, fatal to acero's field lookup —
        # and an iterative loop must not spawn a fresh hash-shuffle
        # aggregator actor pool per sweep (BASELINE.md negative result)
        stepped = hash_join(
            frontier.drop_columns(["__pair"]), hop,
            on="ancestor", num_partitions=nparts, use_native=False,
        ).map_batches(
            lambda df, d=depth: _empty() if "node" not in df.columns
            else _pack(pd.DataFrame(
                {"node": df["node"].astype("int64"),
                 "ancestor": df["__next"].astype("int64"),
                 "depth": np.int64(d)})),
            batch_format="pandas",
        )
        # an all-empty stepped set ends the walk here (schema() of an
        # all-empty dataset is None, which the joins below reject)
        stepped = stepped.materialize()
        if stepped.count() == 0:
            break
        # min-depth semantics in ONE co-location (fused anti join +
        # dedup — a separate anti_join then a dedup group map would
        # pay two shuffles per sweep): tag stepped "N" and seen "S",
        # hash-partition on the packed pair, keep one N row per pair
        # that has no S row
        def _tag(side, keys_only):
            def fn(df: pd.DataFrame) -> pd.DataFrame:
                if "__pair" not in df.columns:
                    out = (pd.DataFrame(
                        {"__pair": pd.Series(dtype="int64")})
                        if keys_only else _empty())
                    out["__tag"] = pd.Series(dtype="object")
                    return out
                df = df[["__pair"]].copy() if keys_only else df.copy()
                df["__tag"] = side
                return df

            return fn

        both = stepped.map_batches(
            _tag("N", False), batch_format="pandas"
        ).union(seen.map_batches(_tag("S", True),
                                 batch_format="pandas"))

        def _fresh_once(df: pd.DataFrame) -> pd.DataFrame:
            if "__pair" not in df.columns:
                return _empty()
            old = set(df.loc[df["__tag"] == "S", "__pair"])
            new = df[df["__tag"] == "N"]
            new = new[~new["__pair"].isin(old)]
            # reindex, not select: a partition can hold only S rows,
            # whose blocks carry just (__pair, __tag)
            return new.drop_duplicates("__pair").reindex(
                columns=["node", "ancestor", "depth", "__pair"]).astype(
                {c: "int64" for c in
                 ("node", "ancestor", "depth", "__pair")})

        frontier = partitioned_group_map(
            both, ["__pair"], _fresh_once, num_partitions=nparts,
        ).materialize()
        levels.append(frontier)
        seen = seen.union(frontier.select_columns(["__pair"]))

    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out.drop_columns(["__pair"])


WALK_MUL = 2654435761  # Knuth multiplicative constant
WALK_MOD = 2147483647  # 2^31 - 1
WALK_STEP_SALT = 40503


def walk_score(
    dst: np.ndarray, step: int, cur: np.ndarray
) -> np.ndarray:
    """Deterministic pseudo-random edge score for walk step choice —
    pure int64 arithmetic both numpy and SQL reproduce exactly:
    ``((dst * 2654435761) % (2^31-1) + step*40503 + cur % 65536)
    % (2^31-1)``. Safe from overflow for node ids < ~3.4e9 (the
    product stays under 2^63); asserted by callers."""
    d = dst.astype(np.int64)
    c = cur.astype(np.int64)
    return ((d * WALK_MUL) % WALK_MOD
            + np.int64(step) * WALK_STEP_SALT
            + c % 65536) % WALK_MOD


def deterministic_walks(
    edges: ray.data.Dataset,
    starts: ray.data.Dataset,
    steps: int = 3,
    src: str = "src",
    dst: str = "dst",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """DeepWalk-style walk corpus with DETERMINISTIC step choice: from
    each start node, ``steps`` hops where hop ``t`` moves to the
    out-neighbor minimizing :func:`walk_score` (ties to the lowest
    neighbor id) — the graph-embedding corpus-generation primitive
    (Perozzi et al. 2014) made replayable and SQL-oracle-checkable
    (each hop unrolls to one join + one windowed argmin in SQL).

    Scale shape: the edge table is static and materialized once; each
    hop is one bounded bucketed hash join (frontier x edges on the
    current node) followed by one per-walk argmin inside a single
    walk-keyed co-location — frontier rows are (walk_id, node, step)
    triples, never corpus-scale payloads. Walks at dead-end nodes
    simply stop (no row at later steps). Output: (walk_id, step,
    node), step 0 = the start node.
    """
    from .joins import hash_join

    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {c: pd.Series(dtype="int64")
             for c in ("walk_id", "node", "step")})

    cur = starts.map_batches(
        lambda df: pd.DataFrame(
            {"walk_id": df["node"].astype("int64"),
             "node": df["node"].astype("int64"),
             "step": np.int64(0)}),
        batch_format="pandas",
    ).materialize()

    etab = edges.map_batches(
        lambda df: pd.DataFrame(
            {"node": df[src].astype("int64"),
             "__dst": df[dst].astype("int64")}).drop_duplicates(),
        batch_format="pandas",
    ).materialize()

    levels = [cur]
    for t in range(1, steps + 1):
        joined = hash_join(cur.drop_columns(["step"]), etab,
                           on="node", num_partitions=num_partitions,
                           use_native=False)

        def _argmin(df: pd.DataFrame, t=t) -> pd.DataFrame:
            if "walk_id" not in df.columns:
                return _empty()
            assert df["__dst"].lt(3_400_000_000).all(), (
                "walk_score overflow bound: node ids must be < 3.4e9")
            score = walk_score(df["__dst"].to_numpy(np.int64), t,
                               df["node"].to_numpy(np.int64))
            picked = (df.assign(__s=score)
                      .sort_values(["walk_id", "__s", "__dst"],
                                   kind="mergesort")
                      .groupby("walk_id", sort=False).head(1))
            return pd.DataFrame(
                {"walk_id": picked["walk_id"].astype("int64"),
                 "node": picked["__dst"].astype("int64"),
                 "step": np.int64(t)})

        cur = partitioned_group_map(
            joined, ["walk_id"], _argmin,
            num_partitions=num_partitions,
        ).materialize()
        if cur.count() == 0:
            break
        levels.append(cur)

    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def k_truss(
    edges: ray.data.Dataset,
    k: int = 4,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 4,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """k-truss of the undirected simple graph by iterative edge
    peeling: repeatedly drop edges supporting fewer than ``k - 2``
    triangles (support recomputed WITHIN the surviving subgraph)
    until a fixpoint or ``max_rounds`` rounds. The truss is the
    standard cohesion refinement of :func:`k_core` — community-core
    extraction over the KG's co-mention/assertion structure.
    Semantics are stated as "the edge set after ``max_rounds``
    peeling rounds" (the k_core contract) so the SQL oracle can
    unroll the SAME bounded chain; the loop exits early at the
    fixpoint, where extra unrolled SQL rounds are no-ops. Returns
    surviving canonical edges ``(u, v)`` with ``u < v``.

    Scale shape per round: the degree-oriented wedge join
    (``_oriented_graph``; O(m^1.5) wedge bound) co-locates wedges
    with their closing edges; each closed triangle credits its THREE
    edges via per-partition partial counts, the dimension-bounded
    support table reduces through the size-adaptive grouped sum, and
    the next round's edge table is the ``sup >= k - 2`` filter of
    that output — the monotone-shrinking re-materialization shape of
    k_core, with triangle support in place of degree.
    """
    from .relational import grouped_agg

    cur = partitioned_group_map(
        edges.select_columns([src, dst]).map_batches(
            lambda df: pd.DataFrame(
                {"u": np.minimum(df[src], df[dst]),
                 "v": np.maximum(df[src], df[dst])}
            )[lambda d: d["u"] != d["v"]].drop_duplicates(),
            batch_format="pandas",
        ),
        ["u"], lambda g: g.drop_duplicates(), num_partitions,
    ).materialize()
    prev_n = cur.count()
    if prev_n == 0:
        # nothing survives canonicalization (e.g. self-loops only):
        # type the empty (u, v) frame from the INPUT edge columns so
        # downstream selects see the contract columns
        head = edges.select_columns([src, dst]).limit(1).to_pandas()
        if len(head):
            return ray.data.from_pandas(
                pd.DataFrame({"u": head[src].iloc[:0],
                              "v": head[dst].iloc[:0]})
            )
        return cur
    if k <= 2:
        # support threshold k - 2 <= 0 is satisfied by EVERY edge
        # (zero-triangle edges included — they never appear in the
        # support table, so the peel loop would wrongly drop them);
        # the 2-truss is by definition the whole simple graph
        return cur
    # dtype-faithful empty edge frame for the full-peel exits: an
    # all-empty round otherwise surfaces as schema-less blocks
    # (PandasBlockSchema(names=[]) — the round-3 warning class) and a
    # KeyError in the downstream grouped sum.
    empty_edges = cur.limit(1).to_pandas().iloc[:0]

    for _ in range(max_rounds):
        oriented, _wd, _deg, _nt = _oriented_graph(
            cur, "u", "v", num_partitions
        )

        def wedges(g: pd.DataFrame) -> pd.DataFrame:
            outs = []
            for s, grp in g.groupby("s", sort=False):
                n = len(grp)
                if n < 2:
                    continue
                nb = grp.sort_values(["dd", "d"], kind="mergesort")[
                    "d"
                ].to_numpy()
                i, j = np.triu_indices(n, k=1)
                outs.append(pd.DataFrame(
                    {"c": s, "w1": nb[i], "w2": nb[j]}))
            if not outs:
                return pd.DataFrame({"c": g["s"].iloc[:0],
                                     "w1": g["d"].iloc[:0],
                                     "w2": g["d"].iloc[:0]})
            return pd.concat(outs, ignore_index=True)

        w = partitioned_group_map(oriented, ["s"], wedges, num_partitions)

        def tag_w(df):
            df = df.copy()
            df["__side"] = "W"
            return df

        def tag_close(df):
            return df.rename(columns={"s": "w1", "d": "w2"})[
                ["w1", "w2"]].assign(__side="C")

        def close(g: pd.DataFrame) -> pd.DataFrame:
            closing = g[g["__side"] == "C"][["w1", "w2"]].drop_duplicates()
            ww = g[g["__side"] == "W"].reindex(columns=["c", "w1", "w2"])
            m = ww.merge(closing, on=["w1", "w2"])
            if m.empty:
                return pd.DataFrame(
                    {"u": g["w1"].iloc[:0], "v": g["w2"].iloc[:0],
                     "n": pd.Series([], dtype="int64")})
            # each closed triangle (c, w1, w2) credits all three edges
            creds = pd.concat([
                pd.DataFrame({"u": np.minimum(m["c"], m["w1"]),
                              "v": np.maximum(m["c"], m["w1"])}),
                pd.DataFrame({"u": np.minimum(m["c"], m["w2"]),
                              "v": np.maximum(m["c"], m["w2"])}),
                # w1/w2 ride in ORIENTATION order (degree, node) —
                # canonicalize to u < v like the other two credits
                pd.DataFrame({"u": np.minimum(m["w1"], m["w2"]),
                              "v": np.maximum(m["w1"], m["w2"])}),
            ], ignore_index=True)
            out = (creds.groupby(["u", "v"], sort=False).size()
                   .reset_index(name="n"))
            out["n"] = out["n"].astype("int64")
            return out

        sup_partials = partitioned_group_map(
            w.map_batches(tag_w, batch_format="pandas").union(
                oriented.map_batches(tag_close, batch_format="pandas")
            ),
            ["w1", "w2"], close, num_partitions,
        ).materialize()
        if sup_partials.count() == 0:
            # no triangles at all among surviving edges: every edge
            # has support 0 < k - 2, the whole round peels
            return ray.data.from_pandas(empty_edges)
        sup = grouped_agg(sup_partials, ["u", "v"], sums=["n"])
        nxt = sup.map_batches(
            lambda df: df.loc[df["n"] >= k - 2, ["u", "v"]],
            batch_format="pandas",
        ).materialize()
        n = nxt.count()
        if n == 0:
            return ray.data.from_pandas(empty_edges)
        cur = nxt
        if n == prev_n:
            # peeling removes only: equal count == same set
            break
        prev_n = n
    return cur
