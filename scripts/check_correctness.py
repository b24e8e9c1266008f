"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and, where an ``oracle_sql()``
entry exists, the oracle on DuckDB over the same parquet files; compares
row count, column names, and an order-insensitive value hash.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

sys.path.insert(0, ".")


def canon_value(v):
    """Type-tagged canonical form.

    The driver's comparator distinguishes integer from floating results, so
    a DuckDB HUGEINT sum() (materialized as float64 by pandas) must NOT
    silently match a Spark BIGINT here — round 1 masked exactly that
    (VERDICT.md "What's wrong" #1). Tag the numeric family into the hash
    so the local gate is at least as strict as the driver's.
    """
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):  # includes numpy float64
        if math.isnan(v):
            return "f:nan"
        # 10 significant digits absorbs representation noise between
        # DuckDB and Spark doubles (both sides round explicitly already)
        return f"f:{v:.10g}"
    if isinstance(v, int):
        return f"i:{v}"
    try:
        import numpy as np
        if isinstance(v, np.integer):
            return f"i:{int(v)}"
    except ImportError:
        pass
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_hash(rows: list[dict]) -> tuple[int, list[str], str]:
    if not rows:
        return 0, [], "empty"
    cols = sorted(rows[0].keys())
    lines = sorted(
        "|".join(canon_value(r[c]) for c in cols) for r in rows
    )
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), cols, h


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from document_convert_to__markdown_spark.pipeline.session import build_session

    spark = build_session("correctness", master="local[8]",
                          shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    orphans = set(oracles) - set(qs)
    if orphans:
        print(f"FAIL  oracle entries without a query: {sorted(orphans)}")
        return 1
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [r.asDict() for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        sn, scols, shash = frame_hash(srows)
        el = time.time() - t0

        if name not in oracles:
            print(f"rows  {name}: {sn} rows, cols={scols} ({el:.1f}s) [rows-only]")
            continue
        try:
            odf = con.execute(oracles[name]).fetch_df()
            orows = odf.to_dict("records")
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: oracle error {e}")
            continue
        on, ocols, ohash = frame_hash(orows)
        ok = (sn, scols, shash) == (on, ocols, ohash)
        tag = "OK   " if ok else "FAIL "
        if not ok:
            failures.append(name)
        print(f"{tag} {name}: spark({sn},{shash}) duck({on},{ohash}) ({el:.1f}s)")
        if not ok:
            if scols != ocols:
                print(f"      cols spark={scols} duck={ocols}")
            if sn and on and scols == ocols:
                s_lines = sorted("|".join(canon_value(r[c]) for c in scols)
                                 for r in srows)
                o_lines = sorted("|".join(canon_value(r[c]) for c in ocols)
                                 for r in orows)
                diffs = [(a, b) for a, b in zip(s_lines, o_lines) if a != b]
                for a, b in diffs[:3]:
                    print(f"      spark: {a}\n      duck : {b}")

    print(f"\n{len(failures)} failures: {failures}" if failures
          else "\nALL MATCH")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
