#!/usr/bin/env python3
"""Dev-time oracle checker (mimics the driver's t2 gate).

Usage: python3 tools/check_oracle.py <sfdir> <verify_out_dir>

Reads each <verify_out_dir>/<name> parquet (written by graft.Verify), runs
the matching oracle SQL from <verify_out_dir>/oracle_sql.json in DuckDB over
the same corpus, normalizes both sides (columns sorted by name, doubles
rounded to 6 dp, timestamps to UTC seconds, NULL -> marker, rows sorted) and
reports match/mismatch per query.
"""
import json
import math
import sys
from pathlib import Path

import duckdb


def norm_cell(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NAN>"
        return f"{round(v, 6):.6f}"
    if hasattr(v, "strftime"):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return sorted(cols), out


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.loads(Path(f"{outdir}/oracle_sql.json").read_text())
    ok = bad = 0
    # Type audit: a windowed/plain sum(BIGINT) silently widens to HUGEINT in
    # DuckDB, which Arrow/pandas materialization renders as float64 and the
    # hash compare then fails ("0.000000" vs "0"). Uncast DECIMAL has the
    # same round-trip hazard. Every oracle output column must be a plain
    # renderable type.
    for name in sorted(oracle):
        try:
            desc = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
        except Exception as e:
            print(f"TYPE-AUDIT-ERROR {name}: {str(e)[:200]}")
            bad += 1
            continue
        hazards = [(c, t) for c, t, *_ in desc
                   if "HUGEINT" in t.upper() or "DECIMAL" in t.upper()]
        if hazards:
            print(f"TYPE-HAZARD {name}: {hazards}")
            bad += 1
    for name in sorted(oracle):
        sql = oracle[name]
        pq = Path(outdir) / name
        if not pq.exists():
            print(f"MISSING-RESULT {name}")
            bad += 1
            continue
        try:
            r = con.execute(f"SELECT * FROM read_parquet('{pq}/*.parquet')")
            scols, srows = r.description, r.fetchall()
            scols = [d[0] for d in scols]
            o = con.execute(sql)
            ocols, orows = [d[0] for d in o.description], o.fetchall()
        except Exception as e:
            print(f"ERROR {name}: {str(e)[:200]}")
            bad += 1
            continue
        sc, sr = norm_rows(scols, srows)
        oc, orr = norm_rows(ocols, orows)
        if sc != oc:
            print(f"SCHEMA-MISMATCH {name}: spark={sc} oracle={oc}")
            bad += 1
        elif sr != orr:
            diff = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
            print(f"ROW-MISMATCH {name}: spark_rows={len(sr)} oracle_rows={len(orr)} first_diffs={diff}")
            bad += 1
        else:
            print(f"OK {name} ({len(sr)} rows)")
            ok += 1
    print(f"\n{ok} ok, {bad} bad")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
