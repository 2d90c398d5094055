"""Extractor registry + build runner (create_knowledge_graph.py analogue).

YAML config (reference: config/adapters_config.yaml resolved via
importlib at create_knowledge_graph.py:49-64):

```yaml
extractors:
  genes:
    module: biocypher_metta_ray.kg.extractors
    func: gtf_gene_extractor
    args: {path: /data/genes.gtf.gz}
  web:
    module: biocypher_metta_ray.kg.extractors
    func: web_kg_extractor
    args: {documents_dir: /root/testdata/sf0.001}
```

``run_build`` resolves every entry, unions the node/edge datasets
(reference: sequential append, metta_writer.py:99 — ours is a real
``Dataset.union``), validates labels against the schema (drop+count
nonconforming — the reference crashes on unknown edge labels),
dedups nodes on (id,label) and edges on (subj,pred,obj), and
materializes Parquet + MeTTa (+ optional Prolog) with manifests.
"""

from __future__ import annotations

import importlib
import json
import os
from typing import Any

import pandas as pd
import ray.data
import yaml

from ..schema import SchemaRegistry
from ..sinks.metta_sink import write_metta, write_type_defs
from ..stages.skew import partitioned_group_map


def resolve_extractor(spec: dict):
    mod = importlib.import_module(spec["module"])
    fn = getattr(mod, spec.get("func") or spec.get("cls"))
    return fn, spec.get("args", {}) or {}


def _union(parts: list[ray.data.Dataset]) -> ray.data.Dataset | None:
    parts = [p for p in parts if p is not None]
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def conform(
    nodes: ray.data.Dataset | None,
    edges: ray.data.Dataset | None,
    schema: SchemaRegistry,
) -> tuple[ray.data.Dataset | None, ray.data.Dataset | None]:
    """Schema validation: drop rows with undeclared labels, counted via
    state.metrics."""
    node_labels = set(schema.nodes)
    edge_labels = set(schema.edges)

    def check_nodes(df: pd.DataFrame) -> pd.DataFrame:
        ok = df["label"].str.lower().isin(node_labels)
        if (~ok).any():
            from ..state.metrics import incr

            incr("conform", "nodes_dropped", int((~ok).sum()))
        return df[ok]

    def check_edges(df: pd.DataFrame) -> pd.DataFrame:
        ok = df["pred"].str.lower().isin(edge_labels)
        if (~ok).any():
            from ..state.metrics import incr

            incr("conform", "edges_dropped", int((~ok).sum()))
        return df[ok]

    n = nodes.map_batches(check_nodes, batch_format="pandas") if nodes else None
    e = edges.map_batches(check_edges, batch_format="pandas") if edges else None
    return n, e


def run_build(
    config: dict | str,
    output_dir: str,
    schema_path: str | None = None,
    prolog: bool = False,
    dry_run: bool = False,
) -> dict:
    """Run every configured extractor and materialize the graph.

    ``dry_run`` truncates each extractor's output to ~100 rows
    (reference ontologies_adapter.py:61-64)."""
    if isinstance(config, str):
        with open(config) as f:
            config = yaml.safe_load(f)
    schema = SchemaRegistry(schema_path) if schema_path else SchemaRegistry()

    from ..state.metrics import enable_metrics, snapshot

    enable_metrics()
    snapshot(reset=True)

    all_nodes, all_edges = [], []
    for name, spec in (config.get("extractors") or {}).items():
        fn, args = resolve_extractor(spec)
        out = fn(**args)
        n, e = out.get("nodes"), out.get("edges")
        if dry_run:
            n = n.limit(100) if n is not None else None
            e = e.limit(100) if e is not None else None
        all_nodes.append(n)
        all_edges.append(e)

    nodes = _union(all_nodes)
    edges = _union(all_edges)
    nodes, edges = conform(nodes, edges, schema)

    if nodes is not None:
        nodes = partitioned_group_map(
            nodes, ["id", "label"],
            lambda g: g.drop_duplicates(subset=["id", "label"]), 16,
        ).materialize()
    if edges is not None:
        edges = partitioned_group_map(
            edges, ["subj", "pred", "obj"],
            lambda g: g.drop_duplicates(subset=["subj", "pred", "obj"]), 16,
        ).materialize()

    os.makedirs(output_dir, exist_ok=True)
    report: dict[str, Any] = {"extractors": sorted(config.get("extractors") or {})}
    metta_dir = os.path.join(output_dir, "metta")
    write_type_defs(schema, metta_dir)

    from .kg import render_metta_lines, render_prolog_lines

    rendered = render_metta_lines(nodes, edges, schema)
    from ..state.checkpoint import overwrite_parquet

    if nodes is not None:
        overwrite_parquet(nodes,
                          os.path.join(output_dir, "graph", "nodes.parquet"),
                          partition_cols=["label"])
        report["metta_nodes"] = write_metta(rendered["nodes"], metta_dir, "nodes")
        report["n_nodes"] = nodes.count()
    if edges is not None:
        overwrite_parquet(edges,
                          os.path.join(output_dir, "graph", "edges.parquet"),
                          partition_cols=["pred"])
        report["metta_edges"] = write_metta(rendered["edges"], metta_dir, "edges")
        report["n_edges"] = edges.count()
    if prolog:
        pl = render_prolog_lines(nodes, edges, schema)
        pl_dir = os.path.join(output_dir, "prolog")
        if nodes is not None:
            report["prolog_nodes"] = write_metta(pl["nodes"], pl_dir, "nodes", ext=".pl")
        if edges is not None:
            report["prolog_edges"] = write_metta(pl["edges"], pl_dir, "edges", ext=".pl")
    report["metrics"] = snapshot()
    with open(os.path.join(output_dir, "build_report.json"), "w") as f:
        json.dump(report, f, indent=1, sort_keys=True, default=str)
    return report
