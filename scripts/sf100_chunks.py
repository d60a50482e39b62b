#!/usr/bin/env python3
"""Partition the full query list into sf100 chunks (crash-bounded) and
emit the BENCH_ONLY env strings. Exclusions carry the per-query
cost-model line the judge asked for (r10 ask #1); each is a documented
EXACT anchor whose scale twin IS measured (SURVEY §4.1).
Usage: sf100_chunks.py <anchor_bench.json>
"""
import json
import sys

EXCLUDE = {
    # anchor refuses by design: all-pairs cosine guard (MaxExactEmbedRows
    # = 100k) throws on the 4M-row planted corpus; twin q_dedup_embed_lsh
    # is measured at this decade
    "q_dedup_embed": "O(n^2) all-pairs guard throws >100k rows; twin q_dedup_embed_lsh measured",
    # exact-quartile percentile buffers one in-memory sorted buffer per
    # (column) spanning all lineitem rows (600M x 8B per stat column);
    # heap cost model caps the anchor at the 100x decade; twin
    # q_describe_approx measured
    "q_describe": "exact-quartile column buffer ~ rows x 8B per column at 600M rows; twin q_describe_approx measured",
    # same exact-percentile buffer model over the per-group windows
    "q_winsorize": "exact per-group p05/p95 buffers at 600M rows; approx_percentile twin documented at the operator",
    # exact census: m * arboricity wedge volume, 1181s at 100x -> ~3h+
    # projected at 1000x; both sampled twins measured at this decade
    "q_graph_triangles": "m*arboricity wedge volume (1181s at 100x, ~3h projected); twins q_graph_triangles_sampled + _nodesampled measured",
    # edge-sampling over a PROJECTED graph is structurally scan-blind:
    # the ~2.4B-pair co-purchase projection must materialize before the
    # per-edge sample filter can act (r10/r13 probes died in that
    # shuffle's disk spill, not the census). The operator's contract is
    # re-scoped to pre-materialized edge lists (Graph.triangleEstimate
    # scaladoc, r14); the projected-graph decade claim belongs to the
    # node-sampled twin, which kills fact rows AT THE SCAN
    "q_graph_triangles_sampled": "edge sampling cannot precede the 2.4B-pair projection it samples; contract re-scoped to stored edge lists, twin q_graph_triangles_nodesampled measured",
}

# attempted, but grouped last so a failure costs only this chunk
RISKY = [
    "q_ann_ivfpq_residual", "q_ann_drift_report",
    "q_dedup_embed_lsh", "q_stats_pca", "q_dedup_minhash", "q_ann_ivfpq",
    "q_percent_rank", "q_stats_corr", "q_contamination_report",
    "q_semdedup", "q_dedup_cluster_best", "q_text_fingerprint",
    "q_dedup_clusters_ls", "q_dedup_containment", "q_dedup_clusters",
    "q_ntile", "q_quantile_bins", "q_stats_quantiles",
    "q_sample_stratified_exact",
]

anchor = json.load(open(sys.argv[1]))
allq = sorted(anchor["queries"])
bulk = [q for q in allq if q not in EXCLUDE and q not in RISKY]
half = (len(bulk) + 1) // 2
chunks = {"b1": bulk[:half], "b2": bulk[half:],
          "risky": [q for q in RISKY if q in allq]}
for name, qs in chunks.items():
    print(f"{name} {len(qs)} {','.join(qs)}")
print("excluded " + json.dumps(EXCLUDE))
