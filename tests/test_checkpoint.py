"""Checkpoint/resume + MeTTa sink tests (FIXTURES.md §5: kill-after-
stage-k resume -> byte-identical output)."""

import glob
import json
import os

import pytest

import ray.data


def _all_metta_lines(metta_dir: str, group: str) -> list[str]:
    lines = []
    for p in sorted(glob.glob(f"{metta_dir}/{group}/part-*.metta")):
        with open(p) as f:
            lines.extend(f.read().splitlines())
    return sorted(lines)


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    from biocypher_metta_ray.kg.gazetteer import entities_table
    from biocypher_metta_ray.pipelines.kg import materialize_graph
    from biocypher_metta_ray.sources.corpus import read_documents_as_corpus

    out = str(tmp_path_factory.mktemp("kgout"))
    corpus = read_documents_as_corpus("/root/testdata/sf0.001")
    entities = ray.data.from_arrow(entities_table())
    mans = materialize_graph(corpus, entities, out, fingerprint="fp-v1")
    return out, mans, corpus, entities


def test_materialize_layout(built):
    out, mans, *_ = built
    assert os.path.exists(f"{out}/metta/type_defs.metta")
    assert glob.glob(f"{out}/graph/nodes.parquet/label=*/")
    assert glob.glob(f"{out}/graph/edges.parquet/pred=*/")
    assert mans["triples"]["completed"] and not mans["triples"]["resumed"]
    assert mans["metta_edges"]["rows"] > 0
    # manifest counts agree with the files on disk
    n_lines = len(_all_metta_lines(f"{out}/metta", "edges"))
    assert n_lines == mans["metta_edges"]["rows"]


def test_resume_skips_completed_stages(built):
    from biocypher_metta_ray.pipelines.kg import materialize_graph

    out, _mans, corpus, entities = built
    before = _all_metta_lines(f"{out}/metta", "edges")
    mans2 = materialize_graph(corpus, entities, out, fingerprint="fp-v1")
    assert mans2["triples"]["resumed"]
    assert mans2["edges"]["resumed"]
    assert mans2["nodes"]["resumed"]
    after = _all_metta_lines(f"{out}/metta", "edges")
    assert before == after  # byte-identical output across resume


def test_partial_failure_recomputes_only_missing(built):
    from biocypher_metta_ray.pipelines.kg import materialize_graph

    out, _m, corpus, entities = built
    before = _all_metta_lines(f"{out}/metta", "edges")
    # simulate a crash between stage 2 and 3: edge manifest lost
    os.remove(f"{out}/stages/edges.manifest.json")
    mans3 = materialize_graph(corpus, entities, out, fingerprint="fp-v1")
    assert mans3["triples"]["resumed"]
    assert not mans3["edges"]["resumed"]  # recomputed
    assert _all_metta_lines(f"{out}/metta", "edges") == before


def test_fingerprint_change_recomputes(built):
    from biocypher_metta_ray.pipelines.kg import materialize_graph

    out, _m, corpus, entities = built
    mans4 = materialize_graph(corpus, entities, out, fingerprint="fp-v2")
    assert not mans4["triples"]["resumed"]


def test_metta_sink_atomicity(ray_session, tmp_path):
    """No .tmp leftovers; manifest lists exactly the files present."""
    from biocypher_metta_ray.sinks.metta_sink import write_metta

    ds = ray.data.from_items([{"line": f"(gene G{i})"} for i in range(100)])
    man = write_metta(ds, str(tmp_path), "nodes")
    files = set(glob.glob(f"{tmp_path}/nodes/part-*.metta"))
    assert files == set(man["files"])
    assert not glob.glob(f"{tmp_path}/nodes/*.tmp")
    assert man["rows"] == 100


def test_sharded_stage_resumes_per_partition(ray_session, tmp_path):
    """Kill-after-shard-k semantics: only unfinished shards recompute."""
    from biocypher_metta_ray.state.checkpoint import run_stage_sharded

    calls = {"a": 0, "b": 0}

    def mk(name, lo, hi):
        def f():
            calls[name] += 1
            return ray.data.range(hi - lo).map_batches(
                lambda df: df.assign(v=df["id"] + lo), batch_format="pandas"
            )
        return f

    shards = {"a": mk("a", 0, 50), "b": mk("b", 50, 80)}
    root = str(tmp_path)
    ds, man = run_stage_sharded(root, "tripleshard", "fp1", shards)
    assert man["rows"] == 80 and man["computed_shards"] == ["a", "b"]
    assert calls == {"a": 1, "b": 1}

    # simulate a crash that lost shard b's manifest only
    os.remove(f"{root}/tripleshard/b.manifest.json")
    ds2, man2 = run_stage_sharded(root, "tripleshard", "fp1", shards)
    assert man2["resumed_shards"] == ["a"]
    assert man2["computed_shards"] == ["b"]
    assert calls == {"a": 1, "b": 2}  # shard a factory never re-ran
    assert sorted(ds2.to_pandas()["v"]) == list(range(80))
