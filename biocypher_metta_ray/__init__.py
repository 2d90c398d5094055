"""biocypher_metta_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch reimplementation of the capabilities of the reference
engine (Habush/biocypher-metta: adapter -> schema-conformant node/edge
-> MeTTa-script pipeline; see /root/reference, cited per-file in
docstrings) re-expressed Ray-Data-first:

- input corpora are ``ray.data.Dataset`` objects of Arrow blocks
  (Parquet tables of Common-Crawl-style web pages),
- every per-record transform is a vectorized ``map_batches`` kernel,
- stateful stages (alias tries, pattern sets, indexes) are actor pools,
- the only wide sections (canonicalization, dedup) are explicit
  groupby/shuffle stages with documented partitioning keys and skew
  (salting) handling,
- sinks write partitioned Parquet + rendered MeTTa s-expressions with
  per-partition lineage manifests for checkpoint/resume.

Nothing in this package calls ``ray.init``/``ray.shutdown`` — sessions
are owned by the caller (driver, bench.py, or the test fixture).
"""

__version__ = "0.1.0"
