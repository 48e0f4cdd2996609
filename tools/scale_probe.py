"""Empirical scaling probe: measure headline-query wall-clock at
1x/2x/4x/8x the sf0.1 data volume and flag superlinear operators.

The 100 TB design point is argued throughout the repo from plan shape
(bounded partitions, no single-task funnels, broadcast dims). This
tool replaces argument with measurement on the axis we can actually
exercise locally: replicate sf0.1 N times with FK-PRESERVING key
offsets and chart t(N)/t(1) per query against the ideal N.

Replication scheme (copy i of N, stride 10**7 disjoint at any sf up
to ~1x TPC-H):
  - every entity key (orderkey, custkey, suppkey, partkey, event_id,
    user_id, doc_id, vec_id) shifts by i*stride — each copy joins
    within itself, so join/group cardinalities scale by N exactly;
  - region/nation stay fixed (dimensions grow slower than facts —
    also how a real warehouse scales);
  - documents get a per-copy ASCII text suffix: copies are NEAR
    duplicates of each other (the realistic web-crawl shape), so
    dedup operators face N-sized near-dup clusters and the MinHash
    hot-bucket cap does real work; n_chars tracks the suffix;
  - events keep their time range — density per hour grows with N,
    the hypertable/sessionize chunk grain (station/user, day) stays
    bounded per key, exactly the property the plans rely on.

Timings are min-of-reps (min damps transient load better than median
at small rep counts and we compare ratios, not absolutes). Output: a
JSON line per scale plus a final summary of t(max)/t(1) ratios.

    PYTHONPATH=. python tools/scale_probe.py [--scales 1,2,4,8] [--reps 2]
"""

from __future__ import annotations

import json
import os
import sys
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

STRIDE = 10**7

# key columns to shift per table (everything else copies verbatim)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED = ("region", "nation")

# one representative per plan family; all from HEADLINE
PROBE_QIDS = (
    "q_agg_hash",            # scan + hash aggregate
    "q_join_shuffle",        # big-big shuffle join
    "q_join_broadcast",      # broadcast dim join
    "q_olap_local_supplier", # 6-table star
    "q_win_rank",            # partitioned window
    "q_topk_twophase",       # salted two-phase top-k
    "q_rollup_hypertable",   # rollup tree on the (station, day) grain
    "q_funnel_steps",        # events sessionize/window chain
    "q_text_analysis",       # documents tokenize + TF
    "q_dedup_exact",         # digest groupBy
    "q_dedup_fuzzy",         # MinHash/LSH banding (near-dup clusters!)
    "q_sim_search_lsh",      # LSH bucketed ANN
    "q_graph_pagerank",      # iterative: |E| grows ~N
    # r09: the other two slowest headliners (VERDICT r08 item 6) —
    # never probed past the 13-family 8x/16x sweep. The replication
    # scheme shifts user_id per copy, so each copy's edges stay within
    # the copy: the graph becomes N disjoint same-shape components,
    # |V| and |E| scale by exactly N and BFS depth stays fixed.
    "q_graph_bfs",           # broadcast-frontier iterative expansion
    "q_graph_jaccard",       # candidate-capped pair verify
)


def _shift(tbl: pa.Table, cols: list[str], delta: int) -> pa.Table:
    for c in cols:
        idx = tbl.schema.get_field_index(c)
        typ = tbl.schema.field(idx).type
        shifted = pc.add(tbl.column(c), pa.scalar(delta, type=typ))
        tbl = tbl.set_column(idx, tbl.schema.field(idx), shifted)
    return tbl


def materialize_scale(src_dir: str, n: int) -> str:
    """Write the n-times-replicated copy of ``src_dir``; returns its
    path (cached across invocations — the copy is deterministic)."""
    from metoffice_spark.io import TABLES, table_path

    out = os.path.join("/tmp/metoffice_scale", f"x{n}")
    done = os.path.join(out, ".complete")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        base = pq.read_table(table_path(src_dir, t))
        if t in FIXED or n == 1:
            pq.write_table(base, table_path(out, t))
            continue
        copies = []
        for i in range(n):
            c = _shift(base, KEYED.get(t, []), i * STRIDE) if i else base
            if t == "documents" and i:
                # near-duplicate copies: tiny ASCII suffix, n_chars kept
                # consistent with the text it describes
                suffix = f" rev{i}"
                c = c.set_column(
                    c.schema.get_field_index("text"),
                    c.schema.field("text"),
                    pc.binary_join_element_wise(
                        c.column("text").cast(pa.string()), suffix, ""
                    ),
                )
                c = c.set_column(
                    c.schema.get_field_index("n_chars"),
                    c.schema.field("n_chars"),
                    pc.add(c.column("n_chars"), pa.scalar(len(suffix), pa.int64())),
                )
            copies.append(c)
        pq.write_table(pa.concat_tables(copies), table_path(out, t))
    open(done, "w").close()
    return out


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from metoffice_spark.registry import all_queries
    from metoffice_spark.session import get_spark

    scales = [1, 2, 4, 8]
    reps = 2
    args = sys.argv[1:]
    if "--scales" in args:
        i = args.index("--scales")
        scales = [int(x) for x in args[i + 1].split(",")]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
    probe_qids = PROBE_QIDS
    if "--qids" in args:
        # focused re-probe of specific families (e.g. the steepest two
        # at a new scale point) without paying the full 13-family sweep
        i = args.index("--qids")
        probe_qids = tuple(args[i + 1].split(","))
        unknown = [q for q in probe_qids if q not in PROBE_QIDS]
        if unknown:
            sys.exit(f"--qids must come from PROBE_QIDS; unknown: {unknown}")

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scale-probe")
    reg = all_queries()
    results: dict[int, dict[str, float]] = {}
    for n in scales:
        d = materialize_scale(src, n)
        reg[probe_qids[0]](spark, d).limit(1).collect()  # warm footer caches
        t: dict[str, list[float]] = {q: [] for q in probe_qids}
        for _ in range(reps):
            for q in probe_qids:
                t0 = time.perf_counter()
                reg[q](spark, d).write.format("noop").mode("overwrite").save()
                t[q].append(time.perf_counter() - t0)
        results[n] = {q: round(min(v), 3) for q, v in t.items()}
        print(json.dumps({"scale": n, "dir": d, "sec": results[n]}), flush=True)

    lo, hi = min(scales), max(scales)
    ratio = {
        q: round(results[hi][q] / results[lo][q], 2) if results[lo][q] > 0 else None
        for q in probe_qids
    }
    print(
        json.dumps(
            {
                "metric": "scale_probe_ratio",
                "span": f"x{lo}->x{hi}",
                "ideal": round(hi / lo, 1),
                "ratio": ratio,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
