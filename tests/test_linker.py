"""Entity linker: trie longest-match, ambiguity rerank, determinism."""

import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from biocypher_metta_ray.stages.linker import EntityLinker, link_entities

ENTITIES = pd.DataFrame(
    [
        {"entity_id": "E1", "label": "gene", "canonical_name": "delta base",
         "aliases": ["delta base", "alphaterm"]},
        {"entity_id": "E2", "label": "gene", "canonical_name": "deltabase",
         "aliases": ["deltabase", "gammaterm"]},
        # E3/E4 share the ambiguous surface "omega"
        {"entity_id": "E3", "label": "protein", "canonical_name": "omega",
         "aliases": ["omega", "redctx"]},
        {"entity_id": "E4", "label": "protein", "canonical_name": "omega",
         "aliases": ["omega", "bluectx"]},
        {"entity_id": "E5", "label": "gene", "canonical_name": "delta",
         "aliases": ["delta"]},
    ]
)


def _link(text):
    lk = EntityLinker(ENTITIES)
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array([text], pa.string())})
    return lk(t).to_pandas()


def test_longest_match_wins():
    out = _link("x delta base y")
    assert list(out["surface"]) == ["delta base"]
    assert list(out["entity_id"]) == ["E1"]
    # bare "delta" still links to E5
    out2 = _link("x delta y")
    assert list(out2["entity_id"]) == ["E5"]


def test_non_overlapping_greedy():
    out = _link("delta base delta")
    assert list(out["surface"]) == ["delta base", "delta"]
    assert list(out["pos"]) == [0, 2]


def test_ambiguous_surface_context_rerank():
    # "omega" is owned by E3 (redctx) and E4 (bluectx)
    out_red = _link("omega near redctx stuff")
    assert list(out_red[out_red.surface == "omega"]["entity_id"]) == ["E3"]
    out_blue = _link("omega with bluectx nearby")
    assert list(out_blue[out_blue.surface == "omega"]["entity_id"]) == ["E4"]
    # no context at all -> deterministic min entity_id
    out_none = _link("omega alone")
    assert list(out_none[out_none.surface == "omega"]["entity_id"]) == ["E3"]
    assert out_none["n_candidates"].iloc[0] == 2


def test_unknown_tokens_dropped():
    out = _link("nothing matches here")
    assert len(out) == 0


def test_link_entities_stage(ray_session):
    docs = ray.data.from_items(
        [
            {"doc_id": 1, "text": "delta base and gammaterm deltabase"},
            {"doc_id": 2, "text": "omega bluectx"},
        ]
    )
    out = link_entities(docs, ENTITIES, concurrency=(1, 2)).to_pandas()
    got = set(zip(out["doc_id"], out["surface"], out["entity_id"]))
    assert (1, "delta base", "E1") in got
    assert (1, "deltabase", "E2") in got
    assert (2, "omega", "E4") in got


def test_linker_deterministic_across_batching(ray_session):
    docs = [{"doc_id": i, "text": f"omega redctx delta base x{i}"} for i in range(40)]
    a = link_entities(ray.data.from_items(docs), ENTITIES, batch_size=7).to_pandas()
    b = link_entities(ray.data.from_items(docs), ENTITIES, batch_size=40).to_pandas()
    key = ["doc_id", "pos", "surface", "entity_id"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True)[key],
        b.sort_values(key).reset_index(drop=True)[key],
    )
