"""Fingerprint-only exact-dedup rehearsal over the staged 4M-doc bench
corpus (sf0.1 x800: every doc has 800 byte-identical copies — the
dup-flood worst case for exact dedup).

Round-5 rework check (VERDICT r4 "what's wrong" #1): the shuffle must
carry (md5-128, id) triples — 24 B/row — never the text payload. This
script measures wall time AND the decision-pipeline bytes: the
materialized fingerprint-pair table and the candidate table are the
ONLY datasets that enter the wide step, so their size_bytes() is the
shuffle ceiling. Compare against the corpus bytes to confirm
shuffle ∝ ids, not payload. Result recorded in BASELINE.md.

Stage the corpus first with `python bench.py`.
"""
import json
import time

import ray
import ray.data

if not ray.is_initialized():
    ray.init(address="local", num_cpus=32, include_dashboard=False)

from biocypher_metta_ray.stages.dedup import (  # noqa: E402
    content_fp_pairs,
    exact_dedup,
)
from biocypher_metta_ray.stages.extract import extract_text_batch  # noqa: E402

path = "/tmp/graft_bench_corpus_root_testdata_sf0.1_x800"
corpus = ray.data.read_parquet(path, columns=["doc_id", "html"],
                               override_num_blocks=2560)
n = corpus.count()
corpus_bytes = corpus.size_bytes()
docs = corpus.map_batches(extract_text_batch, batch_format="pyarrow")

# instrumentation only (outside the timed window): the fingerprint
# pair table is the ONLY projection that enters the wide step, so its
# bytes are the shuffle ceiling
pair_bytes = docs.map_batches(
    lambda t: content_fp_pairs(t, "text", "doc_id"),
    batch_format="pyarrow",
).materialize().size_bytes()

t0 = time.perf_counter()
n_out = exact_dedup(docs, "text", "doc_id").count()
sec = time.perf_counter() - t0

print(json.dumps({
    "docs": n,
    "survivors": n_out,
    "sec": round(sec, 1),
    "docs_per_sec": round(n / sec),
    "corpus_bytes": corpus_bytes,
    "shuffled_pair_bytes": pair_bytes,
    "payload_vs_shuffle_ratio": round(corpus_bytes / max(pair_bytes, 1), 1),
}))
ray.shutdown()
