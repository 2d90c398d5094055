"""Driver contract: Ray pipelines + DuckDB oracle SQL for every operator.

Each ``queries()`` entry is a Ray-Data-first implementation of an
operator from SURVEY.md §2 (reference-derived relational/KG ops) or of
the training-data-pipeline suite (dedup, similarity, text analysis);
``oracle_sql()`` holds the DuckDB-equivalent SQL over the same parquet
tables. Column names match exactly on both sides. Entries without an
oracle are non-SQL-expressible (distributed union-find, LSH
candidates) and get the driver's rows-only check.

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init``/``ray.shutdown`` anywhere in these code paths.
"""

from __future__ import annotations

import json
import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _rp(sf_dir: str, table: str):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet")


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------

def entry() -> Any:
    """Flagship KG pipeline on /root/testdata/sf0.001: documents ->
    synthesized corpus -> extract -> triples -> canonicalize -> distinct
    edges with mention counts."""
    import ray
    import ray.data

    from biocypher_metta_ray.kg.gazetteer import entities_table
    from biocypher_metta_ray.pipelines.kg import canonical_triples, dedup_edges
    from biocypher_metta_ray.sources.corpus import read_documents_as_corpus

    corpus = read_documents_as_corpus("/root/testdata/sf0.001")
    entities = ray.data.from_arrow(entities_table())
    triples, _ = canonical_triples(corpus, entities)
    return dedup_edges(triples)


# ---------------------------------------------------------------------------
# KG pipeline queries (documents-derived corpus; gazetteer in
# biocypher_metta_ray/kg/gazetteer.py mirrored into the SQL)
# ---------------------------------------------------------------------------

def _q_kg_extract_text(sf_dir: str):
    """Byte-identical extraction gate: synthesize html per document,
    extract, compare against the stored ground-truth text."""
    from biocypher_metta_ray.sources.corpus import read_documents_as_corpus
    from biocypher_metta_ray.stages.extract import extract_text_batch

    corpus = read_documents_as_corpus(sf_dir)
    out = corpus.map_batches(extract_text_batch, batch_format="pyarrow")
    return out.select_columns(["doc_id", "text"])


def _q_kg_mentions(sf_dir: str):
    from biocypher_metta_ray.pipelines.kg import mentions_from_corpus
    from biocypher_metta_ray.sources.corpus import read_documents_as_corpus

    corpus = read_documents_as_corpus(sf_dir)
    m = mentions_from_corpus(corpus)
    return m.select_columns(["doc_id", "surface", "entity_id", "n_mentions"])


def _q_kg_triples(sf_dir: str):
    from biocypher_metta_ray.pipelines.kg import surface_triples_from_corpus
    from biocypher_metta_ray.sources.corpus import read_documents_as_corpus

    corpus = read_documents_as_corpus(sf_dir)
    t = surface_triples_from_corpus(corpus)
    return t.select_columns(["doc_id", "subj_surface", "pred", "obj_surface", "pos"])


def _q_kg_canonical_triples(sf_dir: str):
    import ray.data

    from biocypher_metta_ray.kg.gazetteer import entities_table
    from biocypher_metta_ray.pipelines.kg import canonical_triples, dedup_edges
    from biocypher_metta_ray.sources.corpus import read_documents_as_corpus

    corpus = read_documents_as_corpus(sf_dir)
    entities = ray.data.from_arrow(entities_table())
    triples, _ = canonical_triples(corpus, entities)
    return dedup_edges(triples)


def _q_kg_nodes(sf_dir: str):
    import ray.data

    from biocypher_metta_ray.kg.gazetteer import entities_table
    from biocypher_metta_ray.pipelines.kg import (
        canonical_triples,
        dedup_edges,
        entity_label_map,
        nodes_from_triples,
    )
    from biocypher_metta_ray.sources.corpus import read_documents_as_corpus

    corpus = read_documents_as_corpus(sf_dir)
    entities = ray.data.from_arrow(entities_table())
    triples, _ = canonical_triples(corpus, entities)
    edges = dedup_edges(triples)
    return nodes_from_triples(edges, entity_label_map(entities))


def _q_kg_node_sexpr(sf_dir: str):
    from biocypher_metta_ray.pipelines.kg import render_metta_lines

    nodes = _q_kg_nodes(sf_dir)
    return render_metta_lines(nodes, None)["nodes"]


def _q_kg_edge_sexpr(sf_dir: str):
    from biocypher_metta_ray.pipelines.kg import render_metta_lines

    edges = _q_kg_canonical_triples(sf_dir).drop_columns(["n_mentions"])
    return render_metta_lines(None, edges)["edges"]


def _q_kg_linked_mentions(sf_dir: str):
    """Entity linking over the documents corpus with the gazetteer as
    the alias table (single-token aliases -> greedy matching equals
    every token hit; multi-token/ambiguity behavior unit-tested in
    tests/test_linker.py)."""
    import pyarrow.compute as _pc

    from biocypher_metta_ray.kg.gazetteer import entities_table
    from biocypher_metta_ray.sources.corpus import read_documents_as_corpus
    from biocypher_metta_ray.stages.extract import extract_text_batch, lang_filter
    from biocypher_metta_ray.stages.linker import link_entities

    corpus = read_documents_as_corpus(sf_dir)
    ds = corpus.map_batches(lambda t: lang_filter(t, "en"), batch_format="pyarrow")
    ds = ds.map_batches(extract_text_batch, batch_format="pyarrow")
    linked = link_entities(ds, entities_table().to_pandas())
    return linked.map_batches(
        lambda df: df[["doc_id", "pos", "surface", "entity_id"]],
        batch_format="pandas",
    )


def _q_kg_prolog_facts(sf_dir: str):
    """Prolog node facts (prolog_writer.py:85-92 semantics: lowercased
    label(id). lines)."""
    from biocypher_metta_ray.pipelines.kg import render_prolog_lines

    nodes = _q_kg_nodes(sf_dir)
    return render_prolog_lines(nodes, None)["nodes"]


def _q_kg_canonical_map(sf_dir: str):
    import ray.data

    from biocypher_metta_ray.kg.gazetteer import entities_table
    from biocypher_metta_ray.stages.canonicalize import canonical_mapping

    entities = ray.data.from_arrow(entities_table())
    return canonical_mapping(entities)


# ---------------------------------------------------------------------------
# Relational operator queries (TPC-H-ish tables)
# ---------------------------------------------------------------------------

def _q_filter_project(sf_dir: str):
    """Window filter + projection (reference: check_genomic_location,
    helpers.py:118-142 + per-adapter props projection)."""
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity",
                 "l_extendedprice", "l_shipdate"],
    )

    def f(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], pa.scalar(pd.Timestamp("1995-01-01"))),
                pc.less(t["l_shipdate"], pa.scalar(pd.Timestamp("1996-01-01"))),
            ),
            pc.greater(t["l_quantity"], pa.scalar(25.0)),
        )
        return t.filter(mask).select(
            ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"]
        )

    return ds.map_batches(f, batch_format="pyarrow")


def _q_broadcast_join(sf_dir: str):
    """Broadcast inner hash join, drop-on-miss (tflink_adapter.py:42-44)."""
    import ray.data

    from biocypher_metta_ray.stages.relational import broadcast_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    cust = pd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_mktsegment"],
    ).rename(columns={"c_custkey": "o_custkey"})
    out = broadcast_join(orders, cust, on="o_custkey")
    return out.map_batches(
        lambda t: t.select(["o_orderkey", "o_totalprice", "c_name", "c_mktsegment"]),
        batch_format="pyarrow",
    )


def _q_agg_group(sf_dir: str):
    """Q1-style grouped aggregate with map-side partial combining."""
    import ray.data

    from biocypher_metta_ray.stages.relational import grouped_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )
    out = grouped_agg(
        ds,
        keys=["l_returnflag", "l_linestatus"],
        sums=["l_quantity", "l_extendedprice"],
        count_as="count_order",
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": pc.round(t["l_quantity"], 2),
                "sum_base_price": pc.round(t["l_extendedprice"], 2),
                "count_order": t["count_order"],
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def _q_grouped_events(sf_dir: str):
    """Tumbling-day windowed aggregate over the event stream table."""
    import ray.data

    from biocypher_metta_ray.stages.relational import grouped_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def add_day(df: pd.DataFrame) -> pd.DataFrame:
        df["day"] = df["ts"].dt.strftime("%Y-%m-%d")
        return df[["event_type", "day", "value"]]

    daily = ds.map_batches(add_day, batch_format="pandas")
    out = grouped_agg(daily, keys=["event_type", "day"], sums=["value"],
                      count_as="n_events")
    return out.map_batches(
        lambda t: pa.table(
            {
                "event_type": t["event_type"],
                "day": t["day"],
                "total_value": pc.round(t["value"], 2),
                "n_events": t["n_events"],
            }
        ),
        batch_format="pyarrow",
    )


def _q_latest_event(sf_dir: str):
    """Per-key 'latest row' window (deduplicate-to-newest)."""
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "event_type", "ts", "value"],
    )

    from biocypher_metta_ray.stages.skew import partitioned_group_map

    def latest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"]).drop_duplicates(
            subset=["user_id"], keep="last"
        )
        return g[["user_id", "event_id", "event_type", "value"]]

    return partitioned_group_map(ds, ["user_id"], latest, 16)


def _q_top_k(sf_dir: str):
    import ray.data

    from biocypher_metta_ray.stages.relational import top_k

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    return top_k(ds, 100, by=["o_totalprice", "o_orderkey"],
                 ascending=[False, True])


def _q_semi_join(sf_dir: str):
    import ray.data

    from biocypher_metta_ray.stages.relational import semi_join_filter

    keys = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderstatus"]
        )
        .map_batches(
            lambda t: t.filter(pc.equal(t["o_orderstatus"], "F")).select(["o_orderkey"]),
            batch_format="pyarrow",
        )
        .to_pandas()["o_orderkey"]
    )
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity"],
    )
    return semi_join_filter(li, keys, on="l_orderkey")


def _q_anti_join(sf_dir: str):
    import ray.data

    from biocypher_metta_ray.stages.relational import anti_join_filter

    li_keys = (
        ray.data.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"])
        .map_batches(
            lambda t: pa.table({"l_orderkey": pc.unique(
                t["l_orderkey"].combine_chunks()
                if isinstance(t["l_orderkey"], pa.ChunkedArray)
                else t["l_orderkey"]
            )}),
            batch_format="pyarrow",
        )
        .to_pandas()["l_orderkey"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderstatus"]
    )
    return anti_join_filter(orders, li_keys, on="o_orderkey")


def _q_union_nodes(sf_dir: str):
    """Union of per-source node projections (SURVEY §2.3.8)."""
    import ray.data

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    ).map_batches(
        lambda t: pa.table(
            {
                "id": pc.binary_join_element_wise(
                    pa.array(["part:"] * len(t)),
                    pc.cast(t["p_partkey"], pa.string()),
                    "",
                ),
                "label": pa.array(["part"] * len(t), pa.string()),
                "name": t["p_name"],
            }
        ),
        batch_format="pyarrow",
    )
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).map_batches(
        lambda t: pa.table(
            {
                "id": pc.binary_join_element_wise(
                    pa.array(["supplier:"] * len(t)),
                    pc.cast(t["s_suppkey"], pa.string()),
                    "",
                ),
                "label": pa.array(["supplier"] * len(t), pa.string()),
                "name": t["s_name"],
            }
        ),
        batch_format="pyarrow",
    )
    return part.union(supp)


def _q_distinct_docs(sf_dir: str):
    from biocypher_metta_ray.stages.relational import distinct

    return distinct(_rp(sf_dir, "documents"), ["source", "lang"])


def _q_parse_props(sf_dir: str):
    """Key-value payload parsing (reference: VCF INFO parse,
    dbsnp_adapter.py:25-36) over the events.props JSON column."""
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "props"]
    )

    def parse(df: pd.DataFrame) -> pd.DataFrame:
        df["k"] = (
            df["props"].str.extract(r'"k":\s*(-?\d+)', expand=False).astype("int64")
        )
        return df[["event_id", "k"]]

    return ds.map_batches(parse, batch_format="pandas")


def _q_bucket_join(sf_dir: str):
    """Both-sides-large hash join (native Dataset.join / bucketed
    fallback), lineitem x orders on orderkey."""
    import ray.data

    from biocypher_metta_ray.stages.joins import hash_join

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity"],
    ).map_batches(
        lambda df: df.rename(columns={"l_orderkey": "orderkey"}),
        batch_format="pandas",
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).map_batches(
        lambda df: df.rename(columns={"o_orderkey": "orderkey"}),
        batch_format="pandas",
    )
    return hash_join(li, orders, on="orderkey", num_partitions=16)


def _q_asof_join(sf_dir: str):
    """Backward as-of join: each purchase event joined to the user's
    most recent signup at-or-before it."""
    import ray.data

    from biocypher_metta_ray.stages.joins import asof_join

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "ts"],
    )
    purchases = ev.map_batches(
        lambda df: df.loc[df["event_type"] == "purchase",
                          ["event_id", "user_id", "ts"]],
        batch_format="pandas",
    )
    signups = ev.map_batches(
        lambda df: df.loc[df["event_type"] == "signup", ["user_id", "ts"]]
        .rename(columns={"ts": "signup_ts"})
        .assign(ts=lambda d: d["signup_ts"]),
        batch_format="pandas",
    )
    joined = asof_join(purchases, signups, by="user_id", on="ts")

    def fmt(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["last_signup"] = df["signup_ts"].dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        df["last_signup"] = df["last_signup"].where(
            df["signup_ts"].notna(), "never"
        )
        return df[["event_id", "user_id", "last_signup"]]

    return joined.map_batches(fmt, batch_format="pandas")


def _q_session_windows(sf_dir: str):
    """Gap-based sessionization (30 min) over the event stream."""
    import ray.data

    from biocypher_metta_ray.stages.windows import session_windows

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    )
    out = session_windows(ev, key="user_id", ts_col="ts", gap="30min",
                          order_col="event_id")

    def fmt(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["start_ts"] = df["start_ts"].dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        df["end_ts"] = df["end_ts"].dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        return df

    return out.map_batches(fmt, batch_format="pandas")


def _q_sliding_window(sf_dir: str):
    """Trailing 1 h per-user count/sum for every event."""
    import ray.data

    from biocypher_metta_ray.stages.windows import sliding_window

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "value"],
    )
    out = sliding_window(ev, key="user_id", ts_col="ts", value_col="value",
                         window="1h")
    return out.map_batches(
        lambda df: df[["event_id", "n_window", "sum_window"]],
        batch_format="pandas",
    )


def _q_tumbling_window(sf_dir: str):
    """Per-user hourly tumbling window aggregate."""
    import ray.data

    from biocypher_metta_ray.stages.windows import tumbling_window

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )
    out = tumbling_window(
        ev, key="user_id", ts_col="ts", freq="1h",
        agg={"n_events": ("ts", "count"), "total_value": ("value", "sum")},
    )

    def fmt(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["window"] = df["window"].dt.strftime("%Y-%m-%d %H:%M:%S")
        df["total_value"] = df["total_value"].round(2)
        return df[["user_id", "window", "n_events", "total_value"]]

    return out.map_batches(fmt, batch_format="pandas")


# ---------------------------------------------------------------------------
# Text analysis / dedup / similarity queries
# ---------------------------------------------------------------------------

def _q_stratified_sample(sf_dir: str):
    """Deterministic per-source sample: 3 docs per source with the
    smallest content fingerprint."""
    from biocypher_metta_ray.stages.relational import stratified_sample
    from biocypher_metta_ray.stages.text_stats import fingerprint_batch

    docs = _rp(sf_dir, "documents")

    def with_fp(t: pa.Table) -> pa.Table:
        fp = fingerprint_batch(t)
        return t.append_column("fingerprint", fp["fingerprint"])

    ds = docs.map_batches(with_fp, batch_format="pyarrow")
    out = stratified_sample(ds, ["source"], "fingerprint", k=3)
    return out.map_batches(
        lambda df: df[["source", "doc_id", "fingerprint"]],
        batch_format="pandas",
    )


def _q_word_count(sf_dir: str):
    from biocypher_metta_ray.stages.relational import grouped_agg

    ds = _rp(sf_dir, "documents")

    def toks(t: pa.Table) -> pa.Table:
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.split_pattern(col, " ").flatten()
        return pa.table({"token": flat})

    tokens = ds.map_batches(toks, batch_format="pyarrow")
    return grouped_agg(tokens, keys=["token"], count_as="n")


def _q_token_count(sf_dir: str):
    from biocypher_metta_ray.stages.text_stats import token_count_batch

    return _rp(sf_dir, "documents").map_batches(
        token_count_batch, batch_format="pyarrow"
    )


def _q_quality(sf_dir: str):
    """Integer-count quality metrics (ratio floats stay library-side to
    avoid round-half engine differences)."""
    from biocypher_metta_ray.stages.text_stats import STOPWORDS

    def stats(t: pa.Table) -> pa.Table:
        text = t["text"]
        n_chars = pc.utf8_length(text).cast(pa.int64())
        toks = pc.split_pattern(text, " ")
        n_tokens = pc.list_value_length(toks).cast(pa.int64())
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), lengths)
        stop_mask = pc.is_in(
            flat, value_set=pa.array(list(STOPWORDS["en"]))
        ).to_numpy(zero_copy_only=False)
        n_stop = np.bincount(doc_idx[stop_mask], minlength=len(t)).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": n_chars,
                "n_tokens": n_tokens,
                "n_stopwords": pa.array(n_stop),
            }
        )

    return _rp(sf_dir, "documents").map_batches(stats, batch_format="pyarrow")


def _q_lang_id(sf_dir: str):
    from biocypher_metta_ray.stages.text_stats import lang_id_batch

    return _rp(sf_dir, "documents").map_batches(
        lang_id_batch, batch_format="pyarrow"
    )


def _q_fingerprint(sf_dir: str):
    from biocypher_metta_ray.stages.text_stats import fingerprint_batch

    return _rp(sf_dir, "documents").map_batches(
        fingerprint_batch, batch_format="pyarrow"
    )


def _q_dedup_exact(sf_dir: str):
    """Exact dedup: min doc_id + copy count per distinct text."""
    ds = _rp(sf_dir, "documents")
    from biocypher_metta_ray.stages.dedup import add_content_hash

    hashed = ds.map_batches(
        lambda t: add_content_hash(t.select(["doc_id", "text"])),
        batch_format="pyarrow",
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["content_hash", "text"], sort=False).agg(
            doc_id=("doc_id", "min"), n_copies=("doc_id", "size")
        )
        return g.reset_index()

    partials = hashed.map_batches(partial, batch_format="pandas")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("text", sort=False).agg(
            doc_id=("doc_id", "min"), n_copies=("n_copies", "sum")
        )
        return out.reset_index()[["doc_id", "n_copies", "text"]]

    return partials.groupby("content_hash").map_groups(
        final, batch_format="pandas"
    )


def _q_minhash_pairs(sf_dir: str):
    """MinHash-LSH near-dup pairs, Jaccard-verified (no SQL oracle —
    rows-only check; the unit tests verify against brute force)."""
    from biocypher_metta_ray.stages.dedup import minhash_dedup

    docs = _rp(sf_dir, "documents")
    pairs = minhash_dedup(docs, threshold=0.8)
    return pairs.map_batches(
        lambda df: df[["doc_a", "doc_b"]], batch_format="pandas"
    )


def _q_simhash_pairs(sf_dir: str):
    from biocypher_metta_ray.stages.dedup import simhash_candidates

    docs = _rp(sf_dir, "documents")
    out = simhash_candidates(docs, num_bands=4, max_hamming=3)
    return out.map_batches(
        lambda df: df[["doc_a", "doc_b", "hamming"]], batch_format="pandas"
    )


def _q_embedding_dups(sf_dir: str):
    """Exact cosine>=0.45 pair detection (all-pairs verify; the LSH
    bucketed variant is the scale path, exercised in unit tests)."""
    from biocypher_metta_ray.stages.knn import embedding_dup_pairs

    ds = _rp(sf_dir, "embeddings")
    pairs = embedding_dup_pairs(ds, threshold=0.45, num_planes=0)
    return pairs.map_batches(
        lambda df: df[["id_a", "id_b"]].astype({"id_a": "int64", "id_b": "int64"}),
        batch_format="pandas",
    )


def _q_near_dup_groups(sf_dir: str):
    """Near-dup clusters: MinHash pairs -> connected components ->
    (doc_id, group_id). Rows-only (LSH not SQL-expressible)."""
    from biocypher_metta_ray.stages.dedup import near_dup_groups

    docs = _rp(sf_dir, "documents")
    return near_dup_groups(docs, threshold=0.8)


def _q_embedding_dups_lsh(sf_dir: str):
    """Hyperplane-LSH-bucketed near-dup pairs (approximate scale path;
    exact variant is the `embedding_dups` oracle query)."""
    from biocypher_metta_ray.stages.knn import embedding_dup_pairs

    ds = _rp(sf_dir, "embeddings")
    pairs = embedding_dup_pairs(ds, threshold=0.45, num_planes=4)
    return pairs.map_batches(
        lambda df: df[["id_a", "id_b"]].astype({"id_a": "int64", "id_b": "int64"}),
        batch_format="pandas",
    )


def _q_ivf_knn(sf_dir: str):
    """IVF (centroid-probed) approximate top-10 for the vec_id=0 query."""
    import pyarrow.parquet as pq

    from biocypher_metta_ray.stages.knn import ivf_knn

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    qvec = np.asarray(
        tbl.filter(pc.equal(tbl["vec_id"], 0))["embedding"][0].as_py(),
        dtype=np.float64,
    )
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return ivf_knn(ds, qvec, k=10, num_centroids=8, n_probe=4)[["vec_id"]]


def _q_multimodal_features(sf_dir: str):
    """Media decode/feature plumbing over a deterministic fake-media
    table sized to the documents table (stubbed codec; rows-only)."""
    import ray.data

    from biocypher_metta_ray.stages.multimodal import decode_media, media_table

    n = _rp(sf_dir, "documents").count()
    ds = ray.data.from_arrow(media_table(n, seed=42))
    return decode_media(ds)


def _q_knn(sf_dir: str):
    """Brute-force cosine top-10 against the vec_id=0 embedding."""
    import pyarrow.parquet as pq

    from biocypher_metta_ray.stages.knn import knn_bruteforce

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    qrow = tbl.filter(pc.equal(tbl["vec_id"], 0))
    qvec = np.asarray(qrow["embedding"][0].as_py(), dtype=np.float64)
    ds = _rp(sf_dir, "embeddings")
    df = knn_bruteforce(ds, qvec, k=10, exclude_id=0)
    return df[["vec_id"]]


# ---------------------------------------------------------------------------
# registry + oracle SQL
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # KG pipeline
        "kg_extract_text": _q_kg_extract_text,
        "kg_mentions": _q_kg_mentions,
        "kg_triples": _q_kg_triples,
        "kg_canonical_triples": _q_kg_canonical_triples,
        "kg_nodes": _q_kg_nodes,
        "kg_node_sexpr": _q_kg_node_sexpr,
        "kg_edge_sexpr": _q_kg_edge_sexpr,
        "kg_linked_mentions": _q_kg_linked_mentions,
        "kg_prolog_facts": _q_kg_prolog_facts,
        "kg_canonical_map": _q_kg_canonical_map,
        # relational operators
        "filter_project": _q_filter_project,
        "broadcast_join": _q_broadcast_join,
        "agg_group": _q_agg_group,
        "grouped_events": _q_grouped_events,
        "latest_event": _q_latest_event,
        "top_k": _q_top_k,
        "semi_join": _q_semi_join,
        "anti_join": _q_anti_join,
        "union_nodes": _q_union_nodes,
        "distinct_docs": _q_distinct_docs,
        "parse_props": _q_parse_props,
        "bucket_join": _q_bucket_join,
        "asof_join": _q_asof_join,
        "session_windows": _q_session_windows,
        "sliding_window": _q_sliding_window,
        "tumbling_window": _q_tumbling_window,
        # text / dedup / similarity
        "stratified_sample": _q_stratified_sample,
        "word_count": _q_word_count,
        "token_count": _q_token_count,
        "quality": _q_quality,
        "lang_id": _q_lang_id,
        "fingerprint": _q_fingerprint,
        "dedup_exact": _q_dedup_exact,
        "minhash_pairs": _q_minhash_pairs,
        "simhash_pairs": _q_simhash_pairs,
        "near_dup_groups": _q_near_dup_groups,
        "embedding_dups": _q_embedding_dups,
        "embedding_dups_lsh": _q_embedding_dups_lsh,
        "knn": _q_knn,
        "ivf_knn": _q_ivf_knn,
        "multimodal_features": _q_multimodal_features,
    }


def _kg_sql_parts() -> dict[str, str]:
    from biocypher_metta_ray.kg.gazetteer import (
        ENTITY_SURFACES,
        RELATION_SURFACES,
        sql_in_list,
        sql_values_alias_table,
        sql_values_relation_table,
    )

    ents = sql_in_list(ENTITY_SURFACES)
    gaz = sql_values_alias_table()
    gaz2 = sql_values_alias_table("g2")
    rel = sql_values_relation_table()
    toks = (
        "SELECT doc_id, unnest(string_split(text, ' ')) AS tok, "
        "generate_subscripts(string_split(text, ' '), 1) AS p "
        "FROM documents WHERE lang = 'en'"
    )
    triples = f"""
        WITH toks AS ({toks})
        SELECT a.doc_id, a.tok AS subj_surface, rel.pred,
               c.tok AS obj_surface, a.p - 1 AS pos
        FROM toks a
        JOIN toks b ON a.doc_id = b.doc_id AND b.p = a.p + 1
        JOIN toks c ON a.doc_id = c.doc_id AND c.p = a.p + 2
        JOIN {rel} ON b.tok = rel.word
        WHERE a.tok IN {ents} AND c.tok IN {ents}
    """
    return {"ents": ents, "gaz": gaz, "gaz2": gaz2, "rel": rel,
            "toks": toks, "triples": triples}


def oracle_sql() -> dict[str, str]:
    from biocypher_metta_ray.kg.gazetteer import ENTITIES
    from biocypher_metta_ray.schema import SchemaRegistry

    p = _kg_sql_parts()
    reg = SchemaRegistry()
    ent_rows = ", ".join(
        f"('{eid}', '{lab}')"
        for eid, lab in sorted({(e, l) for (e, l) in ENTITIES.values()})
    )
    edge_rows = ", ".join(
        f"('{lab}', '{e.source}', '{e.target}', '{e.render_label}')"
        for lab, e in sorted(reg.edges.items())
    )
    canon_rows = ", ".join(
        f"('{s}', '{eid}')" for s, (eid, _l) in sorted(ENTITIES.items())
    )
    stop_en = "('the', 'a', 'and', 'of', 'to')"
    stop_de = "('der', 'die', 'und', 'das', 'ein')"
    stop_fr = "('le', 'la', 'et', 'les', 'des')"

    return {
        "kg_extract_text": "SELECT doc_id, text FROM documents",
        "kg_mentions": f"""
            SELECT t.doc_id, t.tok AS surface, gaz.entity_id,
                   count(*) AS n_mentions
            FROM ({p['toks']}) t
            JOIN {p['gaz']} ON t.tok = gaz.surface
            GROUP BY t.doc_id, t.tok, gaz.entity_id
        """,
        "kg_triples": p["triples"],
        "kg_canonical_triples": f"""
            WITH t AS ({p['triples']})
            SELECT gaz.entity_id AS subj, t.pred, g2.entity_id AS obj,
                   count(*) AS n_mentions
            FROM t
            JOIN {p['gaz']} ON t.subj_surface = gaz.surface
            JOIN {p['gaz2']} ON t.obj_surface = g2.surface
            GROUP BY 1, 2, 3
        """,
        "kg_nodes": f"""
            WITH t AS ({p['triples']}),
            surfs AS (SELECT subj_surface AS surface FROM t
                      UNION ALL SELECT obj_surface FROM t)
            SELECT DISTINCT gaz.entity_id AS id, gaz.label
            FROM surfs s JOIN {p['gaz']} ON s.surface = gaz.surface
        """,
        "kg_node_sexpr": f"""
            WITH t AS ({p['triples']}),
            surfs AS (SELECT subj_surface AS surface FROM t
                      UNION ALL SELECT obj_surface FROM t),
            nodes AS (SELECT DISTINCT gaz.entity_id AS id, gaz.label
                      FROM surfs s JOIN {p['gaz']} ON s.surface = gaz.surface)
            SELECT '(' || label || ' ' || id || ')' AS line FROM nodes
        """,
        "kg_edge_sexpr": f"""
            WITH t AS ({p['triples']}),
            edges AS (SELECT DISTINCT gaz.entity_id AS subj, t.pred,
                             g2.entity_id AS obj
                      FROM t
                      JOIN {p['gaz']} ON t.subj_surface = gaz.surface
                      JOIN {p['gaz2']} ON t.obj_surface = g2.surface)
            SELECT '(' || et.render_label || ' (' || et.src || ' ' || subj
                   || ') (' || et.tgt || ' ' || obj || '))' AS line
            FROM edges
            JOIN (VALUES {edge_rows}) AS et(pred, src, tgt, render_label)
              ON edges.pred = et.pred
        """,
        "kg_linked_mentions": f"""
            SELECT t.doc_id, t.p - 1 AS pos, t.tok AS surface,
                   gaz.entity_id
            FROM ({p['toks']}) t
            JOIN {p['gaz']} ON t.tok = gaz.surface
        """,
        "kg_prolog_facts": f"""
            WITH t AS ({p['triples']}),
            surfs AS (SELECT subj_surface AS surface FROM t
                      UNION ALL SELECT obj_surface FROM t),
            nodes AS (SELECT DISTINCT gaz.entity_id AS id, gaz.label
                      FROM surfs s JOIN {p['gaz']} ON s.surface = gaz.surface)
            SELECT lower(label) || '(' || lower(id) || ').' AS line FROM nodes
        """,
        "kg_canonical_map": f"""
            SELECT surface, canonical_id
            FROM (VALUES {canon_rows}) AS m(surface, canonical_id)
        """,
        "filter_project": """
            SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1995-01-01'
              AND l_shipdate < TIMESTAMP '1996-01-01'
              AND l_quantity > 25
        """,
        "broadcast_join": """
            SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        """,
        "agg_group": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   count(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "grouped_events": """
            SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   round(sum(value), 2) AS total_value,
                   count(*) AS n_events
            FROM events GROUP BY 1, 2
        """,
        "latest_event": """
            SELECT user_id, event_id, event_type, value
            FROM events
            QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        """,
        "top_k": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
        """,
        "semi_join": """
            SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
            WHERE l_orderkey IN
                (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
        """,
        "anti_join": """
            SELECT o_orderkey, o_orderstatus FROM orders
            WHERE o_orderkey NOT IN (SELECT DISTINCT l_orderkey FROM lineitem)
        """,
        "union_nodes": """
            SELECT 'part:' || CAST(p_partkey AS VARCHAR) AS id,
                   'part' AS label, p_name AS name FROM part
            UNION ALL
            SELECT 'supplier:' || CAST(s_suppkey AS VARCHAR),
                   'supplier', s_name FROM supplier
        """,
        "distinct_docs": "SELECT DISTINCT source, lang FROM documents",
        "bucket_join": """
            SELECT l.l_orderkey AS orderkey, l.l_linenumber, l.l_quantity,
                   o.o_totalprice
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        """,
        "asof_join": """
            SELECT p.event_id, p.user_id,
                   coalesce(strftime(max(s.ts), '%Y-%m-%d %H:%M:%S.%f'),
                            'never') AS last_signup
            FROM events p
            LEFT JOIN events s
              ON s.user_id = p.user_id AND s.event_type = 'signup'
             AND s.ts <= p.ts
            WHERE p.event_type = 'purchase'
            GROUP BY p.event_id, p.user_id
        """,
        "session_windows": """
            WITH o AS (
                SELECT user_id, ts,
                       lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_ts
                FROM events),
            marked AS (
                SELECT user_id, ts,
                       CASE WHEN prev_ts IS NULL
                                 OR ts - prev_ts > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_s
                FROM o),
            sessions AS (
                SELECT user_id, ts,
                       CAST(sum(new_s) OVER (PARTITION BY user_id
                                             ORDER BY ts
                                             ROWS UNBOUNDED PRECEDING)
                            AS BIGINT) AS session_id
                FROM marked)
            SELECT user_id, session_id, count(*) AS n_events,
                   strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS start_ts,
                   strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS end_ts
            FROM sessions GROUP BY user_id, session_id
        """,
        "sliding_window": """
            SELECT event_id,
                   count(*) OVER w AS n_window,
                   round(sum(value) OVER w, 2) AS sum_window
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                               AND CURRENT ROW)
        """,
        "tumbling_window": """
            SELECT user_id,
                   strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window,
                   count(*) AS n_events,
                   round(sum(value), 2) AS total_value
            FROM events GROUP BY 1, 2
        """,
        "parse_props": """
            SELECT event_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events
        """,
        "stratified_sample": """
            SELECT source, doc_id, fingerprint FROM (
                SELECT source, doc_id,
                       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                           AS fingerprint,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY md5(trim(regexp_replace(lower(text),
                                             '\\s+', ' ', 'g')))) AS rn
                FROM documents)
            WHERE rn <= 3
        """,
        "word_count": """
            SELECT tok AS token, count(*) AS n
            FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
            GROUP BY tok
        """,
        "token_count": """
            SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
            FROM documents
        """,
        "quality": f"""
            SELECT doc_id, length(text) AS n_chars,
                   len(string_split(text, ' ')) AS n_tokens,
                   len(list_filter(string_split(text, ' '),
                       x -> x IN {stop_en})) AS n_stopwords
            FROM documents
        """,
        "lang_id": f"""
            SELECT doc_id,
                   CASE WHEN de_c = 0 AND en_c = 0 AND fr_c = 0 THEN 'und'
                        WHEN de_c >= en_c AND de_c >= fr_c THEN 'de'
                        WHEN en_c >= fr_c THEN 'en'
                        ELSE 'fr' END AS pred_lang
            FROM (
                SELECT doc_id,
                    len(list_filter(string_split(text, ' '), x -> x IN {stop_de})) AS de_c,
                    len(list_filter(string_split(text, ' '), x -> x IN {stop_en})) AS en_c,
                    len(list_filter(string_split(text, ' '), x -> x IN {stop_fr})) AS fr_c
                FROM documents)
        """,
        "fingerprint": """
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
            FROM documents
        """,
        "dedup_exact": """
            SELECT min(doc_id) AS doc_id, count(*) AS n_copies, text
            FROM documents GROUP BY text
        """,
        "embedding_dups": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
        """,
        "knn": """
            SELECT vec_id FROM (
                SELECT vec_id,
                       list_cosine_similarity(embedding,
                           (SELECT embedding FROM embeddings WHERE vec_id = 0)) AS cos
                FROM embeddings WHERE vec_id <> 0
                ORDER BY cos DESC, vec_id ASC LIMIT 10)
        """,
        # minhash_pairs / simhash_pairs: non-SQL-expressible (LSH banding);
        # rows-only check + brute-force-verified unit tests.
    }
