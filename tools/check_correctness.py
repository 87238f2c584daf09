"""Local replica of the driver's t2 correctness gate: run each
``__spark_entry__.queries()`` entry through Spark and its
``oracle_sql()`` through DuckDB on the same parquet, compare row
count, column names, and order-insensitive canonicalized values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
           [--json OUT.json]

``--json`` additionally writes a driver-style artifact ({name:
{rows_match, schema_match, hash_match, spark_rows, oracle_rows,
err}}) so demoted-set oracle coverage is machine-checkable each round
(VERDICT r17 Next #6).
"""

from __future__ import annotations

import datetime as dt
import decimal
import json
import math
import sys
import time

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def canon(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, decimal.Decimal):
        return repr(round(float(v), 9))
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def strict_canon_pdf(pdf):
    """Replicate the driver's pandas canonicalization: sort columns by
    name, sort_values over ALL columns (raises on unhashable cells, as
    the driver does), then render every cell with plain str() — so an
    int64 column and a float64 column of equal values DIFFER
    (``149174`` vs ``149174.0``), matching the driver's hash gate."""
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return ["|".join("∅" if v is None or v != v else str(v) for v in row)
            for row in pdf.itertuples(index=False, name=None)]


def main():
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    from dump_es_parquet_spark.session import get_spark

    spark = get_spark(
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    if "--all" in only or only:
        # include the demoted (still-verified) set — for --all (the
        # full oracle sweep pytest runs, at an arbitrary sf_dir) AND
        # whenever explicit names are given: a demoted name must
        # resolve, not silently check nothing
        only.discard("--all")
        queries = {**queries, **entry.demoted_queries()}
        oracles = {**oracles, **entry.demoted_oracle_sql()}
    unknown = only - set(queries)
    if unknown:
        raise SystemExit(f"unknown query name(s): {sorted(unknown)}")
    failures = []
    results: dict[str, dict] = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            results[name] = _res(err=f"SPARK {type(e).__name__}: {e}")
            print(f"✗ {name}: SPARK ERROR {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            results[name] = _res(
                rows_match=True, spark_rows=len(s_rows),
                err="rows-only (no oracle sql)",
            )
            print(f"~ {name}: rows-only check, {len(s_rows)} rows "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            cur = con.execute(oracles[name])
            d_cols = [c[0] for c in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:
            failures.append(name)
            results[name] = _res(
                spark_rows=len(s_rows),
                err=f"ORACLE {type(e).__name__}: {e}",
            )
            print(f"✗ {name}: ORACLE ERROR {type(e).__name__}: {e}")
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"schema spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            cs, cd = canon_rows(s_cols, s_rows), canon_rows(d_cols, d_rows)
            if cs != cd:
                diff = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if not problems:
            # driver-style strict pass: dtype-sensitive str() rendering
            try:
                ss = strict_canon_pdf(sdf.toPandas())
                dd = strict_canon_pdf(con.execute(oracles[name]).df())
            except Exception as e:
                problems.append(f"STRICT canonicalizer error {type(e).__name__}: {e}")
            else:
                if ss != dd:
                    diff = [(a, b) for a, b in zip(ss, dd) if a != b][:3]
                    problems.append(f"STRICT mismatch, first diffs: {diff}")
        results[name] = _res(
            rows_match=len(s_rows) == len(d_rows),
            schema_match=sorted(s_cols) == sorted(d_cols),
            hash_match=not problems,
            spark_rows=len(s_rows),
            oracle_rows=len(d_rows),
            err="; ".join(problems) or None,
        )
        if problems:
            failures.append(name)
            print(f"✗ {name}: " + "; ".join(problems))
        else:
            print(f"✓ {name}: {len(s_rows)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(results, fh, indent=1)
        print(f"wrote {json_out} ({len(results)} rows)")
    spark.stop()
    return 1 if failures else 0


def _res(rows_match=False, schema_match=False, hash_match=False,
         spark_rows=None, oracle_rows=None, err=None):
    return {
        "rows_match": rows_match,
        "schema_match": schema_match,
        "hash_match": hash_match,
        "spark_rows": spark_rows,
        "oracle_rows": oracle_rows,
        "err": err,
    }


if __name__ == "__main__":
    raise SystemExit(main())
