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
    concurrency: int | tuple = (1, 4),
    batch_size: int = 1024,
    entity_surfaces: tuple[str, ...] | None = None,
    relations: dict[str, str] | None = None,
) -> ray.data.Dataset:
    """corpus (html) -> surface-level triples with provenance.

    The ground-truth ``text`` column, if present, is dropped first —
    extraction must work from ``html`` bytes alone. ``entity_surfaces``
    defaults to the built-in gazetteer; pass the alias vocabulary of
    your entities table for fixture/production runs.
    """
    ds = corpus_ds
    if "text" in ds.schema().names:
        ds = ds.drop_columns(["text"])
    ds = ds.map_batches(lambda t: lang_filter(t, lang), batch_format="pyarrow")
    ds = ds.map_batches(extract_text_batch, batch_format="pyarrow")
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
    concurrency: int | tuple = (1, 4),
    batch_size: int = 1024,
) -> ray.data.Dataset:
    ds = corpus_ds
    if "text" in ds.schema().names:
        ds = ds.drop_columns(["text"])
    ds = ds.map_batches(lambda t: lang_filter(t, lang), batch_format="pyarrow")
    ds = ds.map_batches(extract_text_batch, batch_format="pyarrow")
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
    concurrency: int | tuple = (1, 4),
) -> tuple[ray.data.Dataset, dict[str, str]]:
    """Full extract -> canonicalize chain. Returns (triples, surface map)."""
    mapping_df = canonical_mapping(entities_ds).to_pandas()
    mapping = dict(zip(mapping_df["surface"], mapping_df["canonical_id"]))
    mapping_ref = ray.put(mapping)
    surface = surface_triples_from_corpus(
        corpus_ds,
        lang=lang,
        concurrency=concurrency,
        entity_surfaces=tuple(sorted(mapping)),
    )
    triples = surface.map_batches(
        CanonicalizeTriples,
        fn_constructor_args=(mapping_ref,),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    return triples, mapping


def dedup_edges(triples: ray.data.Dataset) -> ray.data.Dataset:
    """(subj, pred, obj[, provenance]) -> distinct edges with counts.

    Two-phase aggregate: per-batch partial counts (map-side combine)
    then one grouped sum over the much smaller partials — the shuffle
    moves one row per distinct edge per batch, not one per mention
    (SURVEY §2.3.6; reference delegates dedup downstream,
    config/biocypher_config.yaml:12).
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
    final shape as dedup_edges.
    """
    label_ref = ray.put(label_map)

    class EndpointNodes:
        def __init__(self):
            lm = ray.get(label_ref) if not isinstance(label_ref, dict) else label_ref
            self.ids = pa.array(sorted(lm), type=pa.string())
            self.labels = pa.array([lm[k] for k in sorted(lm)], type=pa.string())

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = pa.concat_arrays(
                [
                    batch["subj"].combine_chunks() if isinstance(batch["subj"], pa.ChunkedArray) else batch["subj"],
                    batch["obj"].combine_chunks() if isinstance(batch["obj"], pa.ChunkedArray) else batch["obj"],
                ]
            )
            uniq = pc.unique(ids)
            li = pc.index_in(uniq, self.ids)
            return pa.table({"id": uniq, "label": self.labels.take(li)})

    uniq = triples_or_edges.map_batches(
        EndpointNodes, batch_format="pyarrow", concurrency=(1, 2)
    )
    return uniq.groupby("id").map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def render_metta_lines(
    nodes: ray.data.Dataset | None,
    edges: ray.data.Dataset | None,
    schema: SchemaRegistry | None = None,
) -> dict[str, ray.data.Dataset]:
    """nodes/edges datasets -> datasets of rendered MeTTa lines."""
    schema_path = (schema or SchemaRegistry()).schema_path

    class NodeRender:
        def __init__(self):
            from ..render import MettaRenderer

            self.r = MettaRenderer(SchemaRegistry(schema_path))

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["id"].to_pylist()
            labels = batch["label"].to_pylist()
            props = (
                batch["props_json"].to_pylist()
                if "props_json" in batch.column_names
                else [None] * len(ids)
            )
            lines = self.r.render_node_batch(ids, labels, props)
            return pa.table({"line": pa.array(lines, pa.string())})

    class EdgeRender:
        def __init__(self):
            from ..render import MettaRenderer

            self.r = MettaRenderer(SchemaRegistry(schema_path))

        def __call__(self, batch: pa.Table) -> pa.Table:
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
            lines = self.r.render_edge_batch(srcs, dsts, labels, props)
            return pa.table({"line": pa.array(lines, pa.string())})

    out = {}
    if nodes is not None:
        out["nodes"] = nodes.map_batches(
            NodeRender, batch_format="pyarrow", concurrency=(1, 2)
        )
    if edges is not None:
        out["edges"] = edges.map_batches(
            EdgeRender, batch_format="pyarrow", concurrency=(1, 2)
        )
    return out
