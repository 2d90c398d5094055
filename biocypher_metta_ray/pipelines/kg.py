"""The flagship KG-construction pipeline (SURVEY §7.1):

    corpus.parquet (url, warc_ts, html, lang)
      -> read_parquet                           [streaming blocks]
      -> filter(lang == 'en')                   [vectorized mask]
      -> map_batches(extract_text)              [stateless tasks; byte-identical per url]
      -> map_batches(TripleExtractor, pool)     [actor pool: vocab built once]
      -> canonicalize                           [wide: union-find over alias graph,
                                                 broadcast map applied per batch]
      -> conform to schema                      [drop undeclared labels]
      -> dedup edges groupby((subj,pred,obj))   [shuffle, pre-counted per batch]
      -> nodes/edges Parquet + MeTTa render

Reference flow being reimplemented: create_knowledge_graph.py:49-72
(adapter loop -> writer); all per-stage citations in the stage modules.
"""

from __future__ import annotations

import json
from functools import lru_cache

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..schema import SchemaRegistry
from ..stages.canonicalize import CanonicalizeTriples, canonical_mapping
from ..stages.extract import extract_text_batch, lang_filter
from ..stages.mentions import MentionCounter, TripleExtractor


def surface_triples_from_corpus(
    corpus_ds: ray.data.Dataset,
    lang: str = "en",
    concurrency: int | tuple | None = None,
    batch_size: int = 1024,
    entity_surfaces: tuple[str, ...] | None = None,
    relations: dict[str, str] | None = None,
) -> ray.data.Dataset:
    """corpus (html) -> surface-level triples with provenance.

    The ground-truth ``text`` column, if present, is dropped first —
    extraction must work from ``html`` bytes alone. ``entity_surfaces``
    defaults to the built-in gazetteer; pass the alias vocabulary of
    your entities table for fixture/production runs.

    Execution: by default the extractor runs as STATELESS TASKS — the
    vocabulary state is a few KB, so tasks rebuild it per invocation
    (closure), stay elastic, and fuse with the read (measured: a fixed
    actor pool adds cold-start + pool-sizing overheads that dominate
    at small per-doc cost). Pass ``concurrency`` to switch to an actor
    pool — the right shape once the linker state is expensive (big
    alias tries, embedding indexes).
    """
    ds = corpus_ds
    if "text" in ds.schema().names:
        ds = ds.drop_columns(["text"])
    ds = ds.map_batches(lambda t: lang_filter(t, lang), batch_format="pyarrow")
    ds = ds.map_batches(extract_text_batch, batch_format="pyarrow")
    if concurrency is None:
        extractor = TripleExtractor(
            entity_surfaces=entity_surfaces, relations=relations
        )
        return ds.map_batches(
            extractor.__call__,
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    return ds.map_batches(
        TripleExtractor,
        fn_constructor_kwargs={
            "entity_surfaces": entity_surfaces,
            "relations": relations,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def mentions_from_corpus(
    corpus_ds: ray.data.Dataset,
    lang: str = "en",
    concurrency: int | tuple | None = None,
    batch_size: int = 1024,
) -> ray.data.Dataset:
    """Stateless tasks by default; pass ``concurrency`` for an actor
    pool (see surface_triples_from_corpus)."""
    ds = corpus_ds
    if "text" in ds.schema().names:
        ds = ds.drop_columns(["text"])
    ds = ds.map_batches(lambda t: lang_filter(t, lang), batch_format="pyarrow")
    ds = ds.map_batches(extract_text_batch, batch_format="pyarrow")
    if concurrency is None:
        counter = MentionCounter()
        return ds.map_batches(
            counter.__call__, batch_format="pyarrow", batch_size=batch_size
        )
    return ds.map_batches(
        MentionCounter,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def entity_label_map(entities_ds: ray.data.Dataset) -> dict[str, str]:
    """entity_id -> node label (dimension-scale driver-side lookup)."""
    df = entities_ds.select_columns(["entity_id", "label"]).to_pandas()
    return dict(zip(df["entity_id"], df["label"]))


def canonical_triples(
    corpus_ds: ray.data.Dataset,
    entities_ds: ray.data.Dataset,
    lang: str = "en",
    concurrency: int | tuple | None = None,
    mapping: dict[str, str] | None = None,
    canon_concurrency: int | tuple | None = None,
) -> tuple[ray.data.Dataset, dict[str, str]]:
    """Full extract -> canonicalize chain. Returns (triples, surface map).

    ``mapping`` (surface -> canonical_id) may be supplied when already
    computed — it is corpus-size-independent, so callers timing the
    corpus-proportional phase precompute it once.
    """
    if mapping is None:
        mapping_df = canonical_mapping(entities_ds).to_pandas()
        mapping = dict(zip(mapping_df["surface"], mapping_df["canonical_id"]))
    mapping_ref = ray.put(mapping)
    surface = surface_triples_from_corpus(
        corpus_ds,
        lang=lang,
        concurrency=concurrency,
        entity_surfaces=tuple(sorted(mapping)),
    )
    if canon_concurrency is None:
        # stateless-task path: ship only the object ref in the task
        # closure and rebuild the probe arrays ONCE PER WORKER PROCESS
        # (module cache) — a large gazetteer must never ride the
        # closure itself, and per-batch rebuilds would be worse
        def canonize(batch):
            canon = _canonicalizer_cache(mapping_ref)
            return canon(batch)

        triples = surface.map_batches(canonize, batch_format="pyarrow")
    else:
        triples = surface.map_batches(
            CanonicalizeTriples,
            fn_constructor_args=(mapping_ref,),
            batch_format="pyarrow",
            concurrency=canon_concurrency,
        )
    return triples, mapping


_CANON_CACHE: dict = {}


def _canonicalizer_cache(mapping_ref) -> CanonicalizeTriples:
    """Per-worker-process CanonicalizeTriples instance keyed by the
    broadcast ref: the dict is fetched from the object store once per
    process (plasma-cached per node), and the sorted Arrow probe
    arrays are built once, not once per batch."""
    key = getattr(mapping_ref, "hex", lambda: id(mapping_ref))()
    inst = _CANON_CACHE.get(key)
    if inst is None:
        inst = CanonicalizeTriples(mapping_ref)
        _CANON_CACHE.clear()  # one live mapping per worker is typical
        _CANON_CACHE[key] = inst
    return inst


def dedup_edges(
    triples: ray.data.Dataset, shuffle_partitions: int = 16
) -> ray.data.Dataset:
    """(subj, pred, obj[, provenance]) -> distinct edges with counts.

    Two-phase aggregate: per-batch partial counts (map-side combine)
    then one grouped sum over the much smaller partials — the shuffle
    moves one row per distinct edge per batch, not one per mention
    (SURVEY §2.3.6; reference delegates dedup downstream,
    config/biocypher_config.yaml:12). The partials are coalesced to
    ``shuffle_partitions`` blocks first: the sort-based groupby pays
    per-block overhead, and partials are orders of magnitude smaller
    than the input (measured: 128 tiny blocks cost ~9 s of pure
    shuffle overhead vs <1 s after coalescing). Raise
    ``shuffle_partitions`` when the distinct-edge set itself is large.
    """

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(["subj", "pred", "obj"]).to_pandas()
        g = (
            df.groupby(["subj", "pred", "obj"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = triples.map_batches(partial, batch_format="pyarrow")
    partials = partials.repartition(shuffle_partitions)
    from ray.data.aggregate import Sum

    return (
        partials.groupby(["subj", "pred", "obj"])
        .aggregate(Sum("n", alias_name="n_mentions"))
    )


def nodes_from_triples(
    triples_or_edges: ray.data.Dataset, label_map: dict[str, str]
) -> ray.data.Dataset:
    """Distinct (id, label) node set from edge endpoints.

    Per-batch distinct then a grouped global distinct — same partial/
    final shape as dedup_edges. The label lookup is KB-scale broadcast
    state, so the kernel is a STATELESS task function (zero-copy
    ray.get per batch) — no actor pool to become the throughput
    ceiling on a large cluster.
    """
    keys = sorted(label_map)
    lookup_ref = ray.put(
        (np.asarray(keys, dtype=object),
         np.asarray([label_map[k] for k in keys], dtype=object))
    )

    def endpoint_nodes(batch: pa.Table) -> pa.Table:
        id_np, label_np = ray.get(lookup_ref)
        ids = pa.concat_arrays(
            [
                batch["subj"].combine_chunks() if isinstance(batch["subj"], pa.ChunkedArray) else batch["subj"],
                batch["obj"].combine_chunks() if isinstance(batch["obj"], pa.ChunkedArray) else batch["obj"],
            ]
        )
        uniq = pc.unique(ids)
        li = pc.index_in(uniq, pa.array(id_np, type=pa.string()))
        return pa.table(
            {"id": uniq, "label": pa.array(label_np, type=pa.string()).take(li)}
        )

    uniq = triples_or_edges.map_batches(endpoint_nodes, batch_format="pyarrow")
    from ..stages.skew import partitioned_group_map

    return partitioned_group_map(
        uniq, ["id"], lambda g: g.drop_duplicates(subset=["id"]), 8
    )


def materialize_graph(
    corpus_ds: ray.data.Dataset,
    entities_ds: ray.data.Dataset,
    out_dir: str,
    fingerprint: str,
    lang: str = "en",
    concurrency: int | tuple | None = None,
    prolog: bool = False,
) -> dict:
    """Full checkpointed build: corpus -> triples -> edges/nodes ->
    Parquet partitions + MeTTa scripts + type_defs + manifests.

    Each wide stage is a resumable checkpoint (state/checkpoint.py):
    rerunning with the same ``fingerprint`` skips completed stages;
    a changed fingerprint recomputes. Final layout:

        {out_dir}/stages/{triples,edges,nodes}/part-*.parquet
        {out_dir}/stages/*.manifest.json
        {out_dir}/graph/nodes.parquet/label=<label>/...
        {out_dir}/graph/edges.parquet/pred=<pred>/...
        {out_dir}/metta/{nodes,edges}/part-*.metta + _MANIFEST.json
        {out_dir}/metta/type_defs.metta
    """
    import os

    from ..sinks.metta_sink import write_metta, write_type_defs
    from ..state.checkpoint import run_stage
    from ..state.metrics import enable_metrics, snapshot

    enable_metrics()
    snapshot(reset=True)
    stages_root = os.path.join(out_dir, "stages")
    mans: dict[str, dict] = {}

    triples, mans["triples"] = run_stage(
        stages_root, "triples", fingerprint,
        lambda: canonical_triples(
            corpus_ds, entities_ds, lang=lang, concurrency=concurrency
        )[0],
    )
    mans["triples"] = dict(mans["triples"], metrics=snapshot())
    edges, mans["edges"] = run_stage(
        stages_root, "edges", fingerprint, lambda: dedup_edges(triples)
    )
    label_map = entity_label_map(entities_ds)
    nodes, mans["nodes"] = run_stage(
        stages_root, "nodes", fingerprint,
        lambda: nodes_from_triples(edges, label_map),
    )

    from ..state.checkpoint import overwrite_parquet

    graph_dir = os.path.join(out_dir, "graph")
    overwrite_parquet(
        nodes, os.path.join(graph_dir, "nodes.parquet"),
        partition_cols=["label"],
    )
    overwrite_parquet(
        edges, os.path.join(graph_dir, "edges.parquet"),
        partition_cols=["pred"],
    )

    metta_dir = os.path.join(out_dir, "metta")
    schema = SchemaRegistry()
    write_type_defs(schema, metta_dir)
    rendered = render_metta_lines(nodes, edges, schema)
    mans["metta_nodes"] = write_metta(rendered["nodes"], metta_dir, "nodes")
    mans["metta_edges"] = write_metta(rendered["edges"], metta_dir, "edges")
    if prolog:
        pl_dir = os.path.join(out_dir, "prolog")
        pl = render_prolog_lines(nodes, edges, schema)
        mans["prolog_nodes"] = write_metta(pl["nodes"], pl_dir, "nodes", ext=".pl")
        mans["prolog_edges"] = write_metta(pl["edges"], pl_dir, "edges", ext=".pl")
    return mans


@lru_cache(maxsize=8)
def _worker_renderer(kind: str, schema_path: str):
    """Per-worker-process renderer cache. Render kernels run as
    STATELESS tasks (no actor pool to cap a large cluster); the
    renderer + schema registry build once per worker process here and
    are reused by every batch that lands on it — same init-once
    economics as an actor ``__init__`` without the pool-size ceiling."""
    from ..render import MettaRenderer, PrologRenderer

    cls = MettaRenderer if kind == "metta" else PrologRenderer
    return cls(SchemaRegistry(schema_path))


def render_metta_lines(
    nodes: ray.data.Dataset | None,
    edges: ray.data.Dataset | None,
    schema: SchemaRegistry | None = None,
) -> dict[str, ray.data.Dataset]:
    """nodes/edges datasets -> datasets of rendered MeTTa lines."""
    schema_path = (schema or SchemaRegistry()).schema_path

    def node_render(batch: pa.Table) -> pa.Table:
        r = _worker_renderer("metta", schema_path)
        ids = batch["id"].to_pylist()
        labels = batch["label"].to_pylist()
        props = (
            batch["props_json"].to_pylist()
            if "props_json" in batch.column_names
            else [None] * len(ids)
        )
        lines = r.render_node_batch(ids, labels, props)
        return pa.table({"line": pa.array(lines, pa.string())})

    def edge_render(batch: pa.Table) -> pa.Table:
        r = _worker_renderer("metta", schema_path)
        srcs = batch["subj"].to_pylist()
        dsts = batch["obj"].to_pylist()
        labels = batch["pred"].to_pylist()
        if "props_json" in batch.column_names:
            props = batch["props_json"].to_pylist()
        elif "n_mentions" in batch.column_names:
            props = [
                json.dumps({"n_mentions": int(n)})
                for n in batch["n_mentions"].to_pylist()
            ]
        else:
            props = [None] * len(srcs)
        lines = r.render_edge_batch(srcs, dsts, labels, props)
        return pa.table({"line": pa.array(lines, pa.string())})

    out = {}
    if nodes is not None:
        out["nodes"] = nodes.map_batches(node_render, batch_format="pyarrow")
    if edges is not None:
        out["edges"] = edges.map_batches(edge_render, batch_format="pyarrow")
    return out


def render_prolog_lines(
    nodes: ray.data.Dataset | None,
    edges: ray.data.Dataset | None,
    schema: SchemaRegistry | None = None,
) -> dict[str, ray.data.Dataset]:
    """nodes/edges datasets -> datasets of Prolog fact lines
    (render.PrologRenderer; reference prolog_writer.py:85-130)."""
    schema_path = (schema or SchemaRegistry()).schema_path

    def node_render(batch: pa.Table) -> pa.Table:
        r = _worker_renderer("prolog", schema_path)
        lines: list[str] = []
        props = (
            batch["props_json"].to_pylist()
            if "props_json" in batch.column_names
            else [None] * len(batch)
        )
        for i, lab, pj in zip(
            batch["id"].to_pylist(), batch["label"].to_pylist(), props
        ):
            lines.extend(r.render_node(i, lab, json.loads(pj) if pj else None))
        return pa.table({"line": pa.array(lines, pa.string())})

    def edge_render(batch: pa.Table) -> pa.Table:
        r = _worker_renderer("prolog", schema_path)
        lines: list[str] = []
        if "props_json" in batch.column_names:
            props = batch["props_json"].to_pylist()
        elif "n_mentions" in batch.column_names:
            props = [
                json.dumps({"n_mentions": int(n)})
                for n in batch["n_mentions"].to_pylist()
            ]
        else:
            props = [None] * len(batch)
        for s, d, lab, pj in zip(
            batch["subj"].to_pylist(), batch["obj"].to_pylist(),
            batch["pred"].to_pylist(), props,
        ):
            lines.extend(
                r.render_edge(s, d, lab, json.loads(pj) if pj else None)
            )
        return pa.table({"line": pa.array(lines, pa.string())})

    out = {}
    if nodes is not None:
        out["nodes"] = nodes.map_batches(node_render, batch_format="pyarrow")
    if edges is not None:
        out["edges"] = edges.map_batches(edge_render, batch_format="pyarrow")
    return out


def degree_table(
    edges: ray.data.Dataset, shuffle_partitions: int = 16
) -> ray.data.Dataset:
    """Per-node degree statistics over a distinct-edge list:
    (node, out_deg, in_deg, degree) — the first graph-analytics pass a
    KG build runs for skew diagnosis (hub entities are exactly the
    hot keys the salting machinery targets; stages/skew.py).

    Same map-side-combine shape as ``dedup_edges``: per-batch partial
    out/in counts (two C-speed groupbys per block), one grouped sum
    over node keys — the shuffle moves one row per distinct node per
    batch, never the edge list."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(["subj", "obj"]).to_pandas()
        out = (
            df.groupby("subj", sort=False).size().rename("out_deg")
            .reset_index().rename(columns={"subj": "node"})
        )
        inn = (
            df.groupby("obj", sort=False).size().rename("in_deg")
            .reset_index().rename(columns={"obj": "node"})
        )
        m = out.merge(inn, on="node", how="outer")
        m["out_deg"] = m["out_deg"].fillna(0).astype("int64")
        m["in_deg"] = m["in_deg"].fillna(0).astype("int64")
        return m

    summed = (
        edges.map_batches(partial, batch_format="pyarrow")
        .repartition(shuffle_partitions)
        .groupby("node")
        .aggregate(
            Sum("out_deg", alias_name="out_deg"),
            Sum("in_deg", alias_name="in_deg"),
        )
    )
    return summed.map_batches(
        lambda df: df.assign(
            degree=(df["out_deg"] + df["in_deg"]).astype("int64")
        ),
        batch_format="pandas",
    )


def co_mention_edges(
    linked: ray.data.Dataset,
    doc_col: str = "doc_id",
    ent_col: str = "entity_id",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Entity co-mention graph: for every unordered pair of DISTINCT
    entities linked in the same document, the number of documents
    where they co-occur — the co-occurrence edge table a KG build
    derives alongside the verb triples (the reference's edges are all
    pattern-based; co-mention is the statistical sibling every
    corpus-scale KG also ships).

    Scale shape: one doc-keyed co-location makes pair generation exact
    under ANY upstream batching (a body sees every mention of its
    docs), with per-doc pair counts bounded by (distinct entities per
    doc choose 2) — dozens, not corpus-scale; then one pair-keyed
    co-location sums the partials. Returns ``(ent_a, ent_b, n_docs)``
    with ``ent_a < ent_b``.
    """
    from ..stages.skew import partitioned_group_map

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = g[[doc_col, ent_col]].drop_duplicates()
        m = d.merge(d, on=doc_col)
        a, b = f"{ent_col}_x", f"{ent_col}_y"
        m = m[m[a] < m[b]]
        p = (
            m.groupby([a, b], sort=False).size().reset_index(name="n_docs")
        )
        return p.rename(columns={a: "ent_a", b: "ent_b"})

    partials = partitioned_group_map(
        linked.map_batches(
            lambda df: df[[doc_col, ent_col]], batch_format="pandas"
        ),
        [doc_col], pairs, num_partitions,
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby(["ent_a", "ent_b"], sort=False)["n_docs"]
            .sum().reset_index()
        )
        out["n_docs"] = out["n_docs"].astype("int64")
        return out

    return partitioned_group_map(
        partials, ["ent_a", "ent_b"], merge, num_partitions,
        coalesce=2 * num_partitions,
    )


def comention_pmi(
    linked: ray.data.Dataset,
    doc_col: str = "doc_id",
    ent_col: str = "entity_id",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """PMI-weighted co-mention edges: Church & Hanks (1990) pointwise
    mutual information over the document-level co-occurrence counts —
    ``pmi(a, b) = ln(n_ab * N / (n_a * n_b))`` with ``n_x`` = distinct
    documents linking entity ``x`` and ``N`` = distinct documents with
    any link. The statistical edge-weighting every corpus-built KG
    applies on top of raw co-mention counts (a pair that co-occurs
    only because both entities are everywhere gets pmi <= 0).

    Scale shape: reuses :func:`co_mention_edges`' two bounded
    co-locations for the pair counts; the per-entity doc counts are a
    dimension-scale exact distinct (entity-keyed co-location — every
    mention of an entity lands in one body) and ``N`` one distinct
    count, both collected driver-side at entity/scalar scale and
    closure-broadcast into a single streaming score pass — the
    fact-scale mention table never shuffles again. Returns
    ``(ent_a, ent_b, n_docs, pmi)`` with pmi rounded 6.
    """
    from ..stages.relational import distinct
    from ..stages.skew import partitioned_group_map

    # three consumers (pair counts, entity counts, the N scalar) —
    # materialize once or each re-executes the whole upstream
    # extraction chain (the pagerank static-edge-table lesson,
    # measured 14 s -> ~6 s on the bench KG)
    linked = linked.select_columns([doc_col, ent_col]).materialize()
    pairs = co_mention_edges(linked, doc_col, ent_col, num_partitions)
    n_total = distinct(linked.select_columns([doc_col]), [doc_col]).count()

    ent_counts = partitioned_group_map(
        linked.map_batches(
            lambda df: df[[doc_col, ent_col]].drop_duplicates(),
            batch_format="pandas",
        ),
        [ent_col],
        lambda g: (
            g.drop_duplicates()
            .groupby(ent_col, sort=False)
            .size()
            .reset_index(name="n_ent")
        ),
        num_partitions,
    ).to_pandas()  # dimension-scale: one row per entity
    cnt = dict(zip(ent_counts[ent_col], ent_counts["n_ent"].astype("int64")))
    n_f = float(n_total)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        na = df["ent_a"].map(cnt).astype("float64").to_numpy()
        nb = df["ent_b"].map(cnt).astype("float64").to_numpy()
        out = df.copy()
        # integer-exact doubles in, same division/ln order as the SQL
        out["pmi"] = np.round(
            np.log((df["n_docs"].to_numpy().astype("float64") * n_f)
                   / (na * nb)),
            6,
        )
        return out

    return pairs.map_batches(score, batch_format="pandas")


def related_docs(
    linked: ray.data.Dataset,
    min_shared: int = 2,
    max_posting: int | None = None,
    doc_col: str = "doc_id",
    ent_col: str = "entity_id",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Document–document projection of the bipartite doc–entity link
    graph: unordered pairs of documents linked to at least
    ``min_shared`` of the SAME entities — the "related articles" /
    candidate-duplicate-story graph a corpus KG derives from its
    mention table.

    Hub control is part of the stated semantics: an entity linked in
    more than ``max_posting`` documents is DROPPED before pairing (the
    stop-entity rule — co-occurrence through a near-universal entity
    carries no signal, and its posting would emit O(k^2) pairs; the
    SQL oracle states the same rule in a HAVING clause). With the cap
    set, per-entity pair emission is bounded at max_posting^2 rows.

    Scale shape: one entity-keyed co-location (postings are complete
    per body, so the cap and the pair emission are exact under any
    upstream batching) emits per-entity (doc_a, doc_b) partials with
    in-body combining, one pair-keyed map-side-combined sum
    (grouped_agg) counts shared entities, and the threshold filter
    streams. Returns ``(doc_a, doc_b, n_shared)`` with doc_a < doc_b.
    """
    from ..stages.relational import grouped_agg
    from ..stages.skew import partitioned_group_map

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = g[[doc_col, ent_col]].drop_duplicates()
        if max_posting is not None:
            sizes = d.groupby(ent_col, sort=False)[doc_col].transform("size")
            d = d[sizes <= max_posting]
        m = d.merge(d, on=ent_col)
        a, b = f"{doc_col}_x", f"{doc_col}_y"
        m = m[m[a] < m[b]]
        out = (
            m.groupby([a, b], sort=False).size().reset_index(name="n_shared")
        )
        out.columns = ["doc_a", "doc_b", "n_shared"]
        out["n_shared"] = out["n_shared"].astype("int64")
        return out

    partials = partitioned_group_map(
        linked.map_batches(
            lambda df: df[[doc_col, ent_col]], batch_format="pandas"
        ),
        [ent_col], pairs, num_partitions,
    )
    tot = grouped_agg(partials, ["doc_a", "doc_b"], sums=["n_shared"])
    return tot.map_batches(
        lambda df: df[df["n_shared"] >= min_shared], batch_format="pandas"
    )


def negative_triples(
    edges: ray.data.Dataset,
    entity_ids: list[str],
    n_neg: int = 2,
    salt: str = "neg",
) -> ray.data.Dataset:
    """Deterministic TransE-style negative sampling over canonical
    triples: each positive ``(subj, pred, obj)`` emits itself with
    ``label=1`` plus ``n_neg`` object-corrupted copies with
    ``label=0`` — the training pairs every KG-embedding recipe
    (TransE, Bordes et al. 2013) derives from a graph. The reference
    stops at fact files (metta_generator.py); a training pipeline
    needs the contrastive pairs too.

    Corruption is a pure streaming map (zero shuffle): replacement
    object = the SORTED entity vocabulary at index
    ``hash64(f"{salt}{j}:{subj}|{pred}|{obj}") % n_entities`` — fully
    reproducible across partitionings and SQL-checkable (the oracle
    reduces the 64-bit hash mod n via ``((hi % n) * (2^32 % n) +
    lo % n) % n``, exact for any vocabulary size, not just powers of
    two). The vocabulary is dimension-scale and broadcast once via
    ``ray.put``. A corrupted draw MAY collide with the true object;
    the row still carries label 0 (the standard unfiltered-negatives
    convention, stated so the oracle agrees).
    """
    from ..functions.helpers import hash64_column

    vocab = np.array(sorted(set(entity_ids)), dtype=object)
    vocab_ref = ray.put(vocab)

    def corrupt(df: pd.DataFrame) -> pd.DataFrame:
        E = ray.get(vocab_ref)
        n = np.uint64(len(E))
        outs = [
            pd.DataFrame(
                {"subj": df["subj"], "pred": df["pred"],
                 "obj": df["obj"], "label": np.int64(1)}
            )
        ]
        for j in range(1, n_neg + 1):
            keys = [
                f"{salt}{j}:{s}|{p}|{o}"
                for s, p, o in zip(df["subj"], df["pred"], df["obj"])
            ]
            idx = (hash64_column(keys) % n).astype(np.int64)
            outs.append(
                pd.DataFrame(
                    {"subj": df["subj"], "pred": df["pred"],
                     "obj": E[idx], "label": np.int64(0)}
                )
            )
        return pd.concat(outs, ignore_index=True)

    return edges.map_batches(corrupt, batch_format="pandas")


def merge_edge_tables(
    base: ray.data.Dataset,
    delta: ray.data.Dataset,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Incremental KG update: merge a delta corpus's deduped edge
    table into a persisted base snapshot — ``n_mentions`` sums over
    the union, one co-location keyed on ``(subj, pred, obj)``.

    This is the operator a continuously-refreshed corpus-scale KG
    runs instead of a full rebuild (the reference rebuilds from
    scratch per release, create_knowledge_graph.py:49-72; at 100 TB
    the delta is orders of magnitude smaller than the snapshot).
    Invariant (the oracle): merging the edge tables of any disjoint
    corpus split equals the batch build over the whole corpus,
    because extraction is per-document and the edge aggregate is an
    associative sum. Scale note: both sides ship only edge-scale
    rows (already deduped); a production deployment that persists
    the snapshot hash-partitioned on the edge key turns this
    co-location into a map-side merge with zero base movement.
    """
    from ..stages.skew import partitioned_group_map

    both = base.union(delta)

    def body(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby(["subj", "pred", "obj"], sort=False)["n_mentions"]
            .sum().reset_index()
        )
        out["n_mentions"] = out["n_mentions"].astype("int64")
        return out

    return partitioned_group_map(
        both, ["subj", "pred", "obj"], body, num_partitions
    )


def entity_context_embeddings(
    linked: ray.data.Dataset,
    embeddings: ray.data.Dataset,
    doc_col: str = "doc_id",
    ent_col: str = "entity_id",
    vec_id_col: str = "vec_id",
    emb_col: str = "embedding",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Context-mean entity vectors: every entity's embedding is the
    per-dimension mean of the document embeddings of its DISTINCT
    mentioning documents — the standard bootstrap for KG-entity
    representations when no trained entity embeddings exist yet
    (mention-context averaging).

    Scale shape: one doc-keyed tagged-union co-location joins the
    fact-scale mention pairs with the fact-scale embedding rows
    (neither side broadcasts); each partition body reduces to
    entity x dim partial sums (dimension-scale rows), and the final
    grouped sum over (entity, dim) is node-scale. Returns a driver
    pandas frame ``(entity_id, dim, value)`` with UNROUNDED float64
    means — node-scale by construction, the callers round for
    output or feed :func:`propagate_features`.

    Arithmetic contract (for the SQL oracle): per-dimension
    ``sum(x) / n_docs`` in float64 over float32 inputs — the
    centroid_similarity contract (stages/cluster.py).
    """
    from ..stages.skew import partitioned_group_map

    pairs = linked.map_batches(
        lambda df: df[[doc_col, ent_col]].drop_duplicates().rename(
            columns={doc_col: "__doc"}),
        batch_format="pandas",
    )

    def pack(batch: pa.Table) -> pd.DataFrame:
        # vectors ride the shuffle as fixed-width float32 bytes — a
        # plain binary column survives the mixed-schema union that a
        # pandas tensor-extension column cannot (TensorArray concat
        # rejects the NaN-filled other side)
        from ..stages.cluster import _matrix

        X = _matrix(batch, emb_col)  # (n, d) float64; exact for f32 in
        n = len(batch)
        d = X.shape[1] if n else 0
        buf = X.astype(np.float32).tobytes()
        w = 4 * d
        return pd.DataFrame(
            {"__doc": batch.column(vec_id_col).to_numpy(
                zero_copy_only=False).astype(np.int64),
             "__emb": [buf[i * w:(i + 1) * w] for i in range(n)]}
        )

    vecs = embeddings.map_batches(pack, batch_format="pyarrow")
    both = pairs.union(vecs)

    def body(g: pd.DataFrame) -> pd.DataFrame:
        m = g.loc[g[ent_col].notna(), ["__doc", ent_col]].drop_duplicates()
        v = g.loc[g[ent_col].isna(), ["__doc", "__emb"]]
        if m.empty or v.empty:
            return pd.DataFrame(
                {ent_col: pd.Series([], dtype=object),
                 "dim": pd.Series([], dtype="int64"),
                 "s": pd.Series([], dtype="float64"),
                 "n": pd.Series([], dtype="int64")}
            )
        j = m.merge(v, on="__doc")
        X = np.frombuffer(
            b"".join(j["__emb"]), dtype=np.float32
        ).reshape(len(j), -1).astype(np.float64)
        cols = pd.DataFrame(X, index=j[ent_col].to_numpy())
        s = cols.groupby(level=0, sort=False).sum()
        n = cols.groupby(level=0, sort=False).size()
        long = s.stack().reset_index()
        long.columns = [ent_col, "dim", "s"]
        long["dim"] = long["dim"].astype("int64") + 1  # 1-based like SQL
        long["n"] = n.reindex(long[ent_col]).to_numpy(dtype=np.int64)
        return long

    partials = partitioned_group_map(both, ["__doc"], body, num_partitions)
    agg = partials.to_pandas()
    out = (
        agg.groupby([ent_col, "dim"], sort=False)[["s", "n"]]
        .sum().reset_index()
    )
    out["value"] = out["s"] / out["n"]
    return out[[ent_col, "dim", "value"]]


def propagate_features(
    edges: ray.data.Dataset,
    feats: pd.DataFrame,
    ent_col: str = "entity_id",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """One GNN-style feature-propagation hop over the KG: each node's
    output vector is the per-dimension mean of its DISTINCT undirected
    neighbors' input vectors (the GraphSAGE-mean / SGC aggregation
    step a graph-ML data pipeline runs to materialize smoothed node
    features before training).

    ``feats`` is the node-scale long frame from
    :func:`entity_context_embeddings` (entity, dim, value) —
    broadcast once via ``ray.put``; the fact-scale edge list streams
    through a node-keyed co-location that dedups the neighbor set per
    node (edges repeating across predicates count once) and reduces
    to node x dim means. Neighbors absent from ``feats`` are dropped
    (inner-join semantics, stated for the oracle). Returns
    ``(node, dim, value)`` with UNROUNDED float64 means.
    """
    from ..stages.skew import partitioned_group_map

    wide = feats.pivot(index=ent_col, columns="dim", values="value")
    dims = list(wide.columns)
    mat_ref = ray.put((wide.index.to_numpy(), wide.to_numpy()))

    def directed(df: pd.DataFrame) -> pd.DataFrame:
        fwd = pd.DataFrame({"node": df["subj"], "nbr": df["obj"]})
        rev = pd.DataFrame({"node": df["obj"], "nbr": df["subj"]})
        return pd.concat([fwd, rev], ignore_index=True).drop_duplicates()

    pairs = edges.map_batches(directed, batch_format="pandas")

    def body(g: pd.DataFrame) -> pd.DataFrame:
        ids, M = ray.get(mat_ref)
        d = g[["node", "nbr"]].drop_duplicates()
        idx = pd.Index(ids).get_indexer(d["nbr"])
        d = d[idx >= 0]
        idx = idx[idx >= 0]
        if d.empty:
            return pd.DataFrame(
                {"node": pd.Series([], dtype=object),
                 "dim": pd.Series([], dtype="int64"),
                 "value": pd.Series([], dtype="float64")}
            )
        cols = pd.DataFrame(
            M[idx], index=d["node"].to_numpy(), columns=dims
        )
        mean = cols.groupby(level=0, sort=False).sum()
        n = cols.groupby(level=0, sort=False).size()
        mean = mean.div(n, axis=0)
        long = mean.stack().reset_index()
        long.columns = ["node", "dim", "value"]
        long["dim"] = long["dim"].astype("int64")
        return long

    return partitioned_group_map(pairs, ["node"], body, num_partitions)


def edge_provenance(
    triples: ray.data.Dataset,
    corpus: ray.data.Dataset,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Temporal KG provenance: for every canonical edge, the first /
    last crawl timestamp among its DISTINCT supporting documents and
    their count — ``(subj, pred, obj, first_seen, last_seen,
    n_docs)``. A continuously-crawled KG keeps this beside
    ``n_mentions`` to age out stale assertions and to date new ones
    (the reference carries no temporal provenance; its adapters emit
    edges with static properties only).

    Scale shape: per-batch (edge, doc) combiner dedup, one doc-keyed
    join against the corpus's (doc_id, warc_ts) projection (both
    sides fact-scale — bucketed, never broadcast), then one
    edge-keyed co-location whose body performs the global
    (edge, doc) dedup (all rows of an edge co-locate) and reduces to
    min/max/nunique.
    """
    from ..stages.joins import hash_join
    from ..stages.skew import partitioned_group_map

    t = triples.map_batches(
        lambda df: df[["doc_id", "subj", "pred", "obj"]].drop_duplicates(),
        batch_format="pandas",
    )
    ts = corpus.map_batches(
        lambda df: df[["doc_id", "warc_ts"]], batch_format="pandas"
    )
    j = hash_join(t, ts, on="doc_id", num_partitions=num_partitions)

    def body(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(subset=["doc_id", "subj", "pred", "obj"])
        out = (
            d.groupby(["subj", "pred", "obj"], sort=False)
            .agg(first_seen=("warc_ts", "min"),
                 last_seen=("warc_ts", "max"),
                 n_docs=("doc_id", "nunique"))
            .reset_index()
        )
        out["n_docs"] = out["n_docs"].astype("int64")
        return out

    return partitioned_group_map(
        j, ["subj", "pred", "obj"], body, num_partitions
    )
