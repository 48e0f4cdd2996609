"""Fuzzed-slice oracle parity: re-run the Spark-vs-DuckDB gate on a
deterministically SAMPLED copy of the testdata.

The per-round driver gate and the local `check_parity` gate both run
against the fixed seed-42 fixture — a query pair that is accidentally
tuned to that fixture (a constant that only holds at this row count, a
branch only one fixture row exercises, an ordering tie the fixture
never produces) passes them forever. This tool perturbs the DATA
instead of the query: fact tables are filtered by a keyed multiplicative
hash (`(key * 2654435761 + seed * 40503) % 1000 < keep‰`), dimension
tables stay full, and `lineitem` follows `orders` via the SAME predicate
on `l_orderkey`, so FK joins stay consistent. Both engines then see the
identical slice, and every registered query must still match its oracle
bitwise.

Any keep-fraction/seed must pass — a failure here is a genuine
data-dependent parity bug even though the stock gate is green.

    PYTHONPATH=. python tools/fuzz_parity.py /root/testdata/sf0.001 \
        --seed 1 --keep 700 [qid ...]

With no qids: every registered query. `--window`: the driver's 50-qid
window. The slice is materialized under /tmp/metoffice_fuzz/ with the
source parquet schemas preserved (pyarrow round-trip, so e.g. the
events timestamp[us] physical type survives).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# fact table -> sampling key. lineitem deliberately keys on l_orderkey
# (not its own row id) so an order keeps either all or none of its
# lines; documents/embeddings sample independently (no FK between them
# is assumed anywhere: sim-search queries join on vec_id only).
SAMPLED = {
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

_MIX = np.uint64(2654435761)


def _keep_mask(keys: np.ndarray, seed: int, keep_permille: int) -> np.ndarray:
    k = keys.astype(np.uint64)
    with np.errstate(over="ignore"):
        h = (k * _MIX + np.uint64(seed * 40503)) % np.uint64(1000)
    return h < np.uint64(keep_permille)


def materialize_slice(src_dir: str, seed: int, keep_permille: int) -> str:
    """Write the sampled copy of ``src_dir`` and return its path."""
    from metoffice_spark.io import TABLES, table_path

    out = os.path.join(
        "/tmp/metoffice_fuzz",
        f"{os.path.basename(os.path.normpath(src_dir))}_s{seed}_k{keep_permille}",
    )
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        src = table_path(src_dir, t)
        dst = table_path(out, t)
        tbl = pq.read_table(src)
        key = SAMPLED.get(t)
        if key is not None:
            mask = _keep_mask(tbl.column(key).to_numpy(), seed, keep_permille)
            tbl = tbl.filter(pa.array(mask))
        pq.write_table(tbl, dst)
    return out


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from metoffice_spark.oracle_check import compare, connect_oracle
    from metoffice_spark.registry import _collect
    from metoffice_spark.session import get_spark

    args = list(sys.argv[1:])
    src_dir = args.pop(0) if args and not args[0].startswith("--") else "/root/testdata/sf0.001"
    seed, keep = 1, 700
    if "--seed" in args:
        i = args.index("--seed"); seed = int(args[i + 1]); del args[i:i + 2]
    if "--keep" in args:
        i = args.index("--keep"); keep = int(args[i + 1]); del args[i:i + 2]
    # --window composes with explicit qids (ADVICE r06: previously it
    # was only honored as the sole remaining token and otherwise fell
    # into the qid set, silently matching nothing).
    use_window = "--window" in args
    if use_window:
        args.remove("--window")
    registered = set(_collect())
    unknown = [a for a in args if a not in registered]
    if unknown:
        sys.exit(f"unknown qid(s): {unknown} — not in the registry")
    only = set(args)
    if use_window:
        only |= set(list(_collect())[:50])

    slice_dir = materialize_slice(src_dir, seed, keep)
    print(f"slice: {slice_dir} (seed={seed} keep={keep}‰ of fact rows)")
    spark = get_spark("fuzz-parity")
    con = connect_oracle(slice_dir)

    failed = []
    for qid, (fn, sql) in sorted(_collect().items()):
        if only and qid not in only:
            continue
        if sql is None:
            n = fn(spark, slice_dir).count()
            print(f"{qid:28s} ROWS-ONLY rows={n}")
            continue
        try:
            problems = compare(spark, con, fn, sql, slice_dir)
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION {type(e).__name__}: {e}"]
        if problems:
            failed.append(qid)
            print(f"{qid:28s} FAIL")
            for p in problems:
                print(f"    {p}")
        else:
            print(f"{qid:28s} OK")
    print(f"\n{len(failed)} failures: {failed}" if failed else "\nall OK")
    sys.exit(1 if failed else 0)
