#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run `graft.Verify` first
(`sbt "runMain graft.Verify <sfDir> <outDir>"`), then this script executes
each oracle SQL in DuckDB over the same parquet tables and compares rows,
schema (column names), and a canonical value hash — development tooling only
(the engine itself never uses DuckDB/python)."""
import sys, json, glob, hashlib
import duckdb

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(repr(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()

def norm(v):
    # parquet int32/int64 vs duckdb ints; floats rounded upstream by design
    if isinstance(v, float) and v.is_integer():
        return int(v)
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["events", "nation", "documents", "embeddings", "lineitem", "orders",
              "customer", "supplier", "part", "region"]:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except Exception:
            pass
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracles):
        sql = oracles[name]
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"{name:24s} ERR no spark output"); failures += 1; continue
        try:
            o = con.execute(sql)
            ocols = [d[0] for d in o.description]
            orows = [tuple(norm(v) for v in r) for r in o.fetchall()]
        except Exception as e:
            print(f"{name:24s} ERR oracle: {str(e)[:160]}"); failures += 1; continue
        s = con.execute(f"SELECT * FROM read_parquet({files!r})")
        scols = [d[0] for d in s.description]
        srows = [tuple(norm(v) for v in r) for r in s.fetchall()]
        rows_ok = len(srows) == len(orows)
        schema_ok = sorted(scols) == sorted(ocols)
        hash_ok = schema_ok and canon(srows, scols) == canon(orows, ocols)
        status = "OK  " if (rows_ok and schema_ok and hash_ok) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{name:24s} {status} rows={len(srows)}/{len(orows)} "
              f"schema={'ok' if schema_ok else f'{sorted(scols)}!={sorted(ocols)}'} hash={'ok' if hash_ok else 'MISMATCH'}")
        if not hash_ok and rows_ok and schema_ok:
            sset, oset = set(srows), set(orows)
            for r in list(sset - oset)[:3]:
                print(f"    spark-only:  {r}")
            for r in list(oset - sset)[:3]:
                print(f"    oracle-only: {r}")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
