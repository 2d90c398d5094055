"""800x duplicate-density LSH stress: near_dup_groups over the staged
4M-doc bench corpus (sf0.1 x800 — every original doc has 800
near-identical copies, the hot-bucket worst case for MinHash LSH).

Stage the corpus first with `python bench.py` (it materializes
/tmp/graft_bench_corpus_root_testdata_sf0.1_x800 on first run).
Result recorded in BASELINE.md §4: 450.4 s = 8,881 docs/s, all 4M
rows grouped, zero object-store spill — the star-edge cap
(stages/dedup.py) keeps per-bucket candidates O(k), so per-doc cost
falls as dup density rises past the cap instead of exploding O(k^2).
"""
import time, json, ray, ray.data

if not ray.is_initialized():
    ray.init(address="local", num_cpus=32, include_dashboard=False)
from biocypher_metta_ray.stages.extract import extract_text_batch
from biocypher_metta_ray.stages.dedup import near_dup_groups

path = "/tmp/graft_bench_corpus_root_testdata_sf0.1_x800"
corpus = ray.data.read_parquet(path, columns=["doc_id", "html"],
                               override_num_blocks=256)
n = corpus.count()
t0 = time.perf_counter()
docs = corpus.map_batches(extract_text_batch, batch_format="pyarrow")
groups = near_dup_groups(docs, threshold=0.8, num_perms=64, num_bands=16)
ngroups = groups.count()
sec = time.perf_counter() - t0
print(json.dumps({"docs": n, "grouped_rows": ngroups, "sec": round(sec, 1),
                  "docs_per_sec": round(n / sec)}))
ray.shutdown()
