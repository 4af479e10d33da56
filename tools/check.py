#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>

Reads each <outDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB (tables registered
as views over <sfDir>/*.parquet), and compares: columns sorted by name,
rows sorted, values compared exactly (floats via repr after round-trip).

Type-strict (round-9): the driver's hasher distinguishes INT128 from
INT64, so a DuckDB `SUM(x) // y` (HUGEINT) vs Spark BIGINT passes a
python-int value compare but fails the driver hash. We therefore also
(a) require the oracle's DuckDB result type to EQUAL the type DuckDB
assigns to the Spark parquet column, and (b) ban HUGEINT/DECIMAL
outright — aggregate-derived arithmetic must be CAST ... AS BIGINT.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return [cols[i] for i in order], out


def norm(v):
    import datetime
    import decimal
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return v


def eq(a, b):
    # exact — mirrors a hash-based compare; floats must match bitwise
    return a == b


BANNED_TYPES = ("HUGEINT", "DECIMAL")


def type_drift(s_cols, s_types, d_cols, d_types):
    """Return a list of human-readable per-column type problems.

    Compares the DuckDB-assigned type of each Spark parquet column with
    the DuckDB result type of the same-named oracle column, and flags
    banned types (HUGEINT/DECIMAL) on either side.
    """
    s_map = {c: str(t) for c, t in zip(s_cols, s_types)}
    d_map = {c: str(t) for c, t in zip(d_cols, d_types)}
    probs = []
    for c in sorted(set(s_map) | set(d_map)):
        st, dt = s_map.get(c), d_map.get(c)
        for side, t in (("spark", st), ("oracle", dt)):
            if t and any(b in t for b in BANNED_TYPES):
                probs.append(f"{c}: {side} type {t} is banned (cast to BIGINT)")
        if st is not None and dt is not None and st != dt:
            probs.append(f"{c}: spark={st} oracle={dt}")
    return probs


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = set(sys.argv[3:])  # optional: check only these query names
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_raw_cols, s_types = spark_rel.columns, spark_rel.types
            s_cols, s_rows = canon(spark_rel.fetchall(), s_raw_cols)
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {str(e)[:200]}")
            n_fail += 1
            continue
        try:
            duck_rel = con.sql(sql)
            d_raw_cols, d_types = duck_rel.columns, duck_rel.types
            d_cols, d_rows = canon(duck_rel.fetchall(), d_raw_cols)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e)[:300]}")
            n_fail += 1
            continue
        drift = type_drift(s_raw_cols, s_types, d_raw_cols, d_types)
        if drift:
            print(f"FAIL {name}: type drift: " + "; ".join(drift))
            n_fail += 1
            continue
        if s_cols != d_cols:
            print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}")
            n_fail += 1
            continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
            print(f"  spark[:2]={s_rows[:2]}")
            print(f"  duck[:2]={d_rows[:2]}")
            n_fail += 1
            continue
        bad = None
        for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
            if not all(eq(a, b) for a, b in zip(sr, dr)):
                bad = (i, sr, dr)
                break
        if bad:
            print(f"FAIL {name}: first diff at sorted row {bad[0]}:")
            print(f"  cols  = {s_cols}")
            print(f"  spark = {bad[1]}")
            print(f"  duck  = {bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    # Full-registry green runs regenerate SCALE.md's oracle-count line,
    # so the doc's claim is produced by the gate, never hand-typed.
    if not only and n_fail == 0:
        update_scale_md(n_pass)
    return 1 if n_fail else 0


def update_scale_md(n_pass, path="SCALE.md"):
    import re
    try:
        text = open(path).read()
    except OSError:
        return
    new = re.sub(r"\d+/\d+ as of [^)\n—]*",
                 f"{n_pass}/{n_pass} as of this file's last gate run ",
                 text, count=1)
    if new != text:
        open(path, "w").write(new)
        print(f"[check] SCALE.md oracle count regenerated: {n_pass}/{n_pass}")
    try:
        readme = open("README.md").read()
    except OSError:
        return
    new = re.sub(r"query registry: \d+ named queries",
                 f"query registry: {n_pass} named queries", readme, count=1)
    if new != readme:
        open("README.md", "w").write(new)
        print(f"[check] README.md query count regenerated: {n_pass}")


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
