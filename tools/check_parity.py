"""CLI for the local oracle-parity gate.

    PYTHONPATH=. python tools/check_parity.py [sf_dir] [qid ...]
    PYTHONPATH=. python tools/check_parity.py [sf_dir] --window

--window checks exactly the driver's correctness window (the first
50 registered qids) — the fastest faithful preflight of what the
round driver will check.
"""

from __future__ import annotations

import sys

from metoffice_spark.oracle_check import compare, connect_oracle
from metoffice_spark.registry import _collect
from metoffice_spark.session import get_spark

if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    args = sys.argv[2:]
    # --window composes with explicit qids; unknown tokens are an error
    # rather than a silent no-match (ADVICE r06, same fix as
    # tools/fuzz_parity.py).
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
    spark = get_spark("parity-check")
    con = connect_oracle(sf_dir)

    failed = []
    for qid, (fn, sql) in sorted(_collect().items()):
        if only and qid not in only:
            continue
        if sql is None:
            n = fn(spark, sf_dir).count()
            print(f"{qid:28s} ROWS-ONLY rows={n}")
            continue
        try:
            problems = compare(spark, con, fn, sql, sf_dir)
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
