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


# ---- dedup-chain checkpoints (VERDICT r4 #9: the multi-pass LSH ----
# chains — leakage_safe_split / incremental_neardup — get the same
# resume-after-kill story materialize_graph already has)

def _dup_docs():
    import pandas as pd

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight")
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base + " again"},          # near-dup of 1
        {"doc_id": 3, "text": "completely different words about ray "
                              "data streaming shuffles and arrow blocks"},
        {"doc_id": 4, "text": "unrelated short text on graph theory "
                              "pagerank eigenvectors and power iteration"},
        {"doc_id": 5, "text": base},                      # exact dup of 1
    ]
    return ray.data.from_pandas(__import__("pandas").DataFrame(rows))


def test_near_dup_groups_checkpoint_resume(ray_session, tmp_path):
    """Kill-after-cluster-election resume: the (doc_id, group_id)
    table reads back from the checkpoint without re-running the LSH
    chain — proven by handing the resumed call a DIFFERENT corpus
    under the same snapshot fingerprint and getting the checkpointed
    clusters back unchanged."""
    from biocypher_metta_ray.stages.dedup import near_dup_groups
    from biocypher_metta_ray.state.checkpoint import read_manifest

    root = str(tmp_path)
    docs = _dup_docs()
    g1 = (near_dup_groups(docs, threshold=0.8, checkpoint_root=root,
                          checkpoint_fingerprint="snap1")
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert set(g1["doc_id"]) == {1, 2, 5}
    assert (g1["group_id"] == 1).all()

    man = read_manifest(root, "near_dup_groups")
    assert man and man["completed"] and man["rows"] == len(g1)
    assert "snap1" in man["fingerprint"]

    # resume: different input, same fingerprint -> checkpointed result
    other = ray.data.from_items(
        [{"doc_id": 99, "text": "nothing in common with anything"}]
    )
    g2 = (near_dup_groups(other, threshold=0.8, checkpoint_root=root,
                          checkpoint_fingerprint="snap1")
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert g2.equals(g1)

    # new snapshot fingerprint -> recompute against the new corpus
    g3 = near_dup_groups(other, threshold=0.8, checkpoint_root=root,
                         checkpoint_fingerprint="snap2").to_pandas()
    assert len(g3) == 0  # no dups in the singleton corpus

    # LSH parameter change invalidates even under a stale fingerprint
    g4 = near_dup_groups(docs, threshold=0.8, num_bands=8,
                         checkpoint_root=root,
                         checkpoint_fingerprint="snap1").to_pandas()
    assert set(g4["doc_id"]) == {1, 2, 5}  # recomputed, not resumed


def test_leakage_safe_split_checkpoint_crash_recovery(ray_session, tmp_path):
    """The split chain resumes from the cluster checkpoint; a crash
    that destroyed the manifest (the commit point) recomputes and
    lands on the identical split."""
    from biocypher_metta_ray.stages.dedup import leakage_safe_split
    from biocypher_metta_ray.state.checkpoint import read_manifest

    root = str(tmp_path)
    docs = _dup_docs()

    def run():
        tr, ho = leakage_safe_split(
            docs, 0.5, threshold=0.8, checkpoint_root=root,
            checkpoint_fingerprint="snapA",
        )
        t = tr.to_pandas().sort_values("doc_id").reset_index(drop=True)
        h = ho.to_pandas().sort_values("doc_id").reset_index(drop=True)
        return t, h

    t1, h1 = run()
    # group-integrity: the whole {1,2,5} near-dup cluster on ONE side
    sides = {int(r.doc_id): "T" for r in t1.itertuples()}
    sides.update({int(r.doc_id): "H" for r in h1.itertuples()})
    assert len({sides[d] for d in (1, 2, 5)}) == 1
    assert read_manifest(root, "near_dup_groups")["completed"]

    # crash before the manifest commit: data dir present, manifest gone
    os.remove(os.path.join(root, "near_dup_groups.manifest.json"))
    t2, h2 = run()
    assert t2.equals(t1) and h2.equals(h1)


def test_incremental_neardup_checkpoint(ray_session, tmp_path):
    """The cross-snapshot drop-id set checkpoints; the resumed run
    skips banding+verify (different delta, same fingerprint -> same
    checkpointed drop decisions applied)."""
    import pandas as pd

    from biocypher_metta_ray.stages.dedup import incremental_neardup
    from biocypher_metta_ray.state.checkpoint import read_manifest

    base_text = ("alpha beta gamma delta epsilon zeta eta theta iota "
                 "kappa lambda mu nu xi omicron pi rho sigma tau")
    base = ray.data.from_pandas(pd.DataFrame(
        [{"doc_id": 1, "text": base_text},
         {"doc_id": 2, "text": "some other base document entirely "
                               "about distributed joins and shuffles"}]
    ))
    delta = ray.data.from_pandas(pd.DataFrame(
        [{"doc_id": 10, "text": base_text},       # dup of base 1 -> drop
         {"doc_id": 11, "text": "fresh new delta content nothing like "
                                "the ingested snapshot at all today"}]
    ))
    root = str(tmp_path)
    s1 = incremental_neardup(
        delta, base, threshold=0.8, checkpoint_root=root,
        checkpoint_fingerprint="ingest-42",
    ).to_pandas()
    assert sorted(s1["doc_id"]) == [11]
    man = read_manifest(root, "neardup_dropped_ids")
    assert man and man["completed"] and man["rows"] == 1

    # resumed run: drop decisions come from the checkpoint
    s2 = incremental_neardup(
        delta, base, threshold=0.8, checkpoint_root=root,
        checkpoint_fingerprint="ingest-42",
    ).to_pandas()
    assert sorted(s2["doc_id"]) == [11]
