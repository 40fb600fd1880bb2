"""Exact driver-hash replay for a SUBSET of queries (by name prefix).

Same norm/value_hash as tools/driver_replay.py — the round driver's
exact comparison — but only over the named queries, so a new batch can
be gated in seconds instead of the ~8-minute full replay. The full
driver_replay.py remains the pre-commit gate for catalog-wide changes.

Usage: python tools/subset_replay.py q336 q337 ...
"""
import hashlib
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entrymod
from crypto_prediction_etl_spark.session import get_spark

SF = "/root/testdata/sf0.01"


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


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
        sdf = qs[name](spark, SF)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name in oracles:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            ok = (
                sorted(scols) == sorted(dcols)
                and len(srows) == len(drows)
                and value_hash(scols, srows) == value_hash(dcols, drows)
            )
            n_pass += ok
            n_fail += not ok
            print(
                f"{'PASS' if ok else 'FAIL'} {name}: {len(srows)} rows "
                f"({time.time() - t0:.1f}s)"
            )
            if not ok:
                if sorted(scols) != sorted(dcols):
                    print(f"  cols spark={sorted(scols)} duck={sorted(dcols)}")
                elif len(srows) != len(drows):
                    print(f"  rows spark={len(srows)} duck={len(drows)}")
                else:
                    smap = {
                        "|".join(norm(r[i]) for i in
                                 sorted(range(len(scols)), key=lambda i: scols[i]))
                        for r in srows
                    }
                    dmap = {
                        "|".join(norm(r[i]) for i in
                                 sorted(range(len(dcols)), key=lambda i: dcols[i]))
                        for r in drows
                    }
                    for line in sorted(smap - dmap)[:3]:
                        print(f"  spark-only: {line}")
                    for line in sorted(dmap - smap)[:3]:
                        print(f"  duck-only:  {line}")
        else:
            print(f"ROWS-ONLY {name}: {len(srows)} rows ({time.time() - t0:.1f}s)")
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} selected")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
