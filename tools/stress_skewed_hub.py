"""Power-law hub stress for the wedge-join family (VERDICT r4 #8).

The bench KG the graph queries normally run on is near-uniform
(~50k canonical edges at sf0.1, max degree ~tens). This rehearsal
runs the degree-oriented machinery (stages/graph.py::_oriented_graph
consumers: triangle_count, neighbor_similarity, k_truss) on a
deterministic synthetic graph 10-40x that size with the skew the
docstrings promise to survive: ONE hub entity adjacent to 30% of all
nodes (the "one entity in 30% of docs" shape) on top of a Zipf(2.1)
degree tail.

The claim under test: orienting every edge from its lower-(degree,
node) endpoint to the higher caps oriented out-degree at O(sqrt(m)),
so wedge emission stays O(m^1.5) and the hub — whose naive neighbor
pairing would be C(60k, 2) ~ 1.8e9 wedges — emits ZERO wedges (all
its edges point INTO it). Recorded in BASELINE.md §4.

Usage: python tools/stress_skewed_hub.py [n_nodes] [n_zipf_edges]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

N_NODES = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
N_ZIPF = int(sys.argv[2]) if len(sys.argv) > 2 else 1_500_000

if not ray.is_initialized():
    ray.init(address="local", num_cpus=32, include_dashboard=False)

rng = np.random.default_rng(42)
# hub: node 0 adjacent to 30% of all nodes
hub_dst = rng.choice(np.arange(1, N_NODES, dtype=np.int64),
                     size=int(0.30 * N_NODES), replace=False)
hub_src = np.zeros(len(hub_dst), dtype=np.int64)
# tail: Zipf(2.1) endpoints folded into the id space (self-loops and
# duplicates are collapsed by the operators themselves)
zs = rng.zipf(2.1, N_ZIPF).astype(np.int64) % N_NODES
zd = rng.zipf(2.1, N_ZIPF).astype(np.int64) % N_NODES
keep = zs != zd
src = np.concatenate([hub_src, zs[keep]])
dst = np.concatenate([hub_dst, zd[keep]])
edges = ray.data.from_arrow(
    pa.table({"src": src, "dst": dst})
).repartition(64).materialize()
m = len(src)
# raw hub degree vs the oriented bound the design claims
print(f"edges={m:,} nodes={N_NODES:,} hub_degree={len(hub_dst):,} "
      f"sqrt(m)={int(np.sqrt(m)):,}", flush=True)

from biocypher_metta_ray.stages.graph import (  # noqa: E402
    k_truss,
    neighbor_similarity,
    triangle_count,
)

out = {}
t0 = time.perf_counter()
tri = triangle_count(edges, num_partitions=64)
out["triangle_count"] = {
    "sec": round(time.perf_counter() - t0, 1),
    "n_triangles": int(tri["n_triangles"].iloc[0]),
}
print(json.dumps({"triangle_count": out["triangle_count"]}), flush=True)

t0 = time.perf_counter()
ns = neighbor_similarity(edges, num_partitions=64)
n_rows = ns.count()
out["neighbor_similarity"] = {
    "sec": round(time.perf_counter() - t0, 1), "rows": n_rows}
print(json.dumps({"neighbor_similarity": out["neighbor_similarity"]}),
      flush=True)

t0 = time.perf_counter()
kt = k_truss(edges, k=4, max_rounds=4, num_partitions=64)
out["k_truss"] = {
    "sec": round(time.perf_counter() - t0, 1), "rows": kt.count()}
print(json.dumps(out), flush=True)
ray.shutdown()
