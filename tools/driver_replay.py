"""Driver-replica: import the public contract and run the full gate."""
import sys, math, time
sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod
from crypto_prediction_etl_spark.session import get_spark
import duckdb

SF = "/root/testdata/sf0.01"
spark = get_spark("driver-replay")

# 1. smoke: entry()
df = entrymod.entry(spark)
rows = df.collect()
print(f"SMOKE entry(): {len(rows)} rows, schema={[f.name for f in df.schema]}")
assert len(rows) > 0

# 2. correctness gate replica: value-hash per query
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def norm(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(round(v, 9))
    if hasattr(v, "isoformat"): return v.isoformat()
    return str(v)

def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    import hashlib
    return hashlib.md5("\n".join(lines).encode()).hexdigest()

qs, oracles = entrymod.queries(), entrymod.oracle_sql()
n_pass = n_fail = 0
for name, fn in sorted(qs.items()):
    t0 = time.time()
    sdf = fn(spark, SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if name in oracles:
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        ok = (sorted(scols) == sorted(dcols) and len(srows) == len(drows)
              and value_hash(scols, srows) == value_hash(dcols, drows))
        n_pass += ok; n_fail += (not ok)
        print(f"{'PASS' if ok else 'FAIL'} {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
    else:
        print(f"ROWS-ONLY {name}: {len(srows)} rows")
print(f"\n{n_pass} pass, {n_fail} fail, {len(qs)} queries")
sys.exit(1 if n_fail else 0)
