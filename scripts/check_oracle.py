"""Local stand-in for the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() twin on DuckDB at sf0.01; compare row
count, column names, and an order-insensitive value hash.

Usage: python scripts/check_oracle.py [query_name ...]

With no query-name args (the full sweep), also writes the machine-readable
result — per-query rows/schema/hash verdicts + seconds — to
ORACLE_SWEEP.json at the repo root, the committed artifact that extends
the driver's CORRECTNESS_r{N}.json (which snapshots only the first ~50
registered queries) to all of them.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return f"{v:.6f}".rstrip("0").rstrip(".") or "0"
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(names: list[str]) -> int:
    from ocr_text_recognition_spark.session import get_spark

    spark = get_spark("check_oracle", cores=8, shuffle_partitions=8)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    targets = names or list(qs)
    failures = []
    report = {}
    for name in targets:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            report[name] = {"pass": False, "err": f"spark error: {str(e)[:300]}"}
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")
            ok = len(srows) > 0
            report[name] = {"pass": ok, "mode": "rows_only",
                            "spark_rows": len(srows),
                            "sec": round(time.time() - t0, 2)}
            if not ok:
                failures.append(name)
                print(f"FAIL  {name}: 0 rows from rows-only query")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [d[0] for d in rel.description]
            orows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            report[name] = {"pass": False, "err": f"duckdb error: {str(e)[:300]}"}
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        if not problems and value_hash(scols, srows) != value_hash(ocols, orows):
            problems.append("value-hash mismatch")
            sset = {tuple(norm_cell(v) for v in r) for r in srows}
            oset = {tuple(norm_cell(v) for v in r) for r in orows}
            so = list(sset - oset)[:2]
            os_ = list(oset - sset)[:2]
            problems.append(f"spark-only={so} oracle-only={os_}")
        report[name] = {
            "pass": not problems,
            "rows_match": len(srows) == len(orows),
            "schema_match": sorted(scols) == sorted(ocols),
            "hash_match": not problems,
            "spark_rows": len(srows),
            "oracle_rows": len(orows),
            "sec": round(time.time() - t0, 2),
        }
        if problems:
            failures.append(name)
            report[name]["err"] = "; ".join(problems)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"OK    {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")
    print(f"\n{len(targets) - len(failures)}/{len(targets)} passed")
    if not names:  # full sweep: persist the committed artifact
        out_path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "ORACLE_SWEEP.json")
        with open(out_path, "w") as f:
            json.dump({"sf_dir": SF_DIR, "generated_at": time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                "passed": len(targets) - len(failures),
                "total": len(targets), "queries": report}, f, indent=1)
        print(f"wrote {out_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
