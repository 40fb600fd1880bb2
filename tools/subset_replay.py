"""Exact driver-hash replay for a SUBSET of queries (by name prefix).

Same pandas canonicalization as tools/driver_replay.py — the round
driver's comparison (toPandas / duckdb .df(), frame-sort probe, value
normalization at the pandas level) — but only over the named queries,
so a new batch can be gated in seconds instead of the ~8-minute full
replay.  The full driver_replay.py remains the pre-commit gate for
catalog-wide changes.

Usage: python tools/subset_replay.py q336 q337 ...
"""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import duckdb

import __spark_entry__ as entrymod
from _canon import compare_frames, frame_lines
from crypto_prediction_etl_spark.session import get_spark

SF = "/root/testdata/sf0.01"


def main() -> int:
    spark = get_spark("subset-replay")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    prefixes = tuple(sys.argv[1:])
    names = [n for n in sorted(qs) if not prefixes or n.startswith(prefixes)]
    n_pass = n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            spdf = qs[name](spark, SF).toPandas()
            if name in oracles:
                dpdf = con.execute(oracles[name]).df()
                verdict, detail = compare_frames(spdf, dpdf)
            else:
                verdict, detail = "ROWS-ONLY", ""
        except Exception as exc:
            verdict, detail = "ERR", f"{type(exc).__name__}: {exc}"
        ok = verdict == "PASS"
        n_pass += ok
        n_fail += verdict in ("FAIL", "ERR")
        nrows = len(spdf) if verdict != "ERR" else -1
        extra = f"  [{detail}]" if detail else ""
        print(f"{verdict} {name}: {nrows} rows ({time.time() - t0:.1f}s){extra}")
        if verdict == "FAIL" and detail == "hash mismatch":
            smap, dmap = set(frame_lines(spdf)), set(frame_lines(dpdf))
            for line in sorted(smap - dmap)[:3]:
                print(f"  spark-only: {line}")
            for line in sorted(dmap - smap)[:3]:
                print(f"  duck-only:  {line}")
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} selected")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
