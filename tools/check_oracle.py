"""Local mimic of the external driver's correctness gate.

Runs every ``queries()`` entry on Spark and, where an ``oracle_sql()``
entry exists, the oracle in DuckDB over the same parquet tables; compares
row count, column names (sorted) and an order-insensitive value hash.
Queries without an oracle get a rows-only check (must not raise;
row count reported).

Usage: python tools/check_oracle.py [--sf /root/testdata/sf0.01] [keys...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from ecc_spark.ops.tables import TABLES  # noqa: E402
from ecc_spark.session import get_spark  # noqa: E402


def _norm(v):
    if v is None:
        return "\x00"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # tolerate float formatting noise, not value noise
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_hash(rows: list[tuple], colnames: list[str]) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("\x01".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8", "replace"))
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    spark = get_spark("check_oracle", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    keys = args.keys or sorted(qs)
    failures = 0
    for key in keys:
        t0 = time.time()
        try:
            sdf = qs[key](spark, args.sf)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {key}: spark raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if key not in oracles:
            print(f"ok*   {key}: rows-only, {len(srows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            cur = con.execute(oracles[key])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            # The external driver converts via pandas, where DuckDB HUGEINT
            # (un-cast integer SUMs) becomes float64 while Spark emits int64 —
            # invisible to fetchall() but a hash mismatch for the driver.
            # Compare pandas dtype *kinds* per column to catch that class.
            opdf = con.execute(oracles[key]).df()
            spdf = sdf.toPandas()
            dtype_problems = []
            for c in sorted(set(spdf.columns) & set(opdf.columns)):
                sk, ok_ = spdf[c].dtype.kind, opdf[c].dtype.kind
                snum = sk in "iuf"
                onum = ok_ in "iuf"
                if snum != onum or (snum and (sk == "f") != (ok_ == "f")):
                    dtype_problems.append(f"dtype-kind {c}: spark={sk} oracle={ok_}")
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {key}: duckdb raised {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = list(dtype_problems)
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        else:
            sh, oh = value_hash(srows, scols), value_hash(orows, ocols)
            if sh != oh:
                problems.append("value-hash mismatch")
                # show a diff sample
                sset = {
                    tuple(_norm(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i]))
                    for r in srows
                }
                oset = {
                    tuple(_norm(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i]))
                    for r in orows
                }
                for d in list(sset - oset)[:2]:
                    problems.append(f"  spark-only: {d}")
                for d in list(oset - sset)[:2]:
                    problems.append(f"  oracle-only: {d}")
        if problems:
            print(f"FAIL  {key}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"ok    {key}: {len(srows)} rows match ({time.time()-t0:.1f}s)")
    print(f"\n{len(keys) - failures}/{len(keys)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
