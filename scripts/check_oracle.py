"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.01, compare row count, column names, and order-insensitive values.

Stricter than the driver (exact sorted-row string equality), so a pass
here should imply a pass there.

Also writes ``CORRECTNESS_local.json`` in the driver's exact row shape
({rows_match, schema_match, hash_match, spark_rows, oracle_rows, err}
per query) so the local gate and the driver gate are directly diffable
(VERDICT r1 item 8).

Usage: python scripts/check_oracle.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def driver_canon(df: pd.DataFrame) -> pd.DataFrame:
    """Replicate the DRIVER's canonicalization step exactly: pandas
    ``sort_values`` over the raw output columns. A list/array cell makes
    the multi-column sort go through ``factorize`` and raise
    ``TypeError: unhashable type: 'list'`` — the precise crash recorded
    against `docs_hashing_tf` / `multi_embed_media` in CORRECTNESS_r02.
    Running it here means any query whose output shape the driver cannot
    canonicalize fails LOCALLY the day it is written (VERDICT r2 item 8).
    """
    cols = sorted(df.columns)
    # belt-and-braces: a SINGLE list-typed column can sneak past pandas'
    # sort (lists are py-comparable) but still isn't driver-hashable
    for c in cols:
        for cell in df[c].head(100):
            if isinstance(cell, (list, dict, set)) or type(cell).__name__ == "ndarray":
                raise TypeError(
                    f"unhashable cell type {type(cell).__name__} in column {c!r}"
                    " — the driver's sort_values canonicalizer would crash on this"
                )
    return df[cols].sort_values(by=cols, kind="mergesort")


def normalize(df: pd.DataFrame) -> list[tuple]:
    df = driver_canon(df)

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
            return "<null>"
        if isinstance(v, float):
            return repr(v)
        if hasattr(v, "isoformat"):
            try:
                if getattr(v, "tzinfo", None) is not None:
                    v = v.tz_convert("UTC").tz_localize(None) if hasattr(v, "tz_convert") else v.astimezone(None)
            except Exception:
                pass
            return v.isoformat()
        if isinstance(v, (list, tuple)):
            return repr(list(v))
        return str(v)

    return sorted(tuple(cell(v) for v in row) for row in df.itertuples(index=False, name=None))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]

    import __spark_entry__ as entrymod
    from crawlers_spark.session import get_spark

    spark = get_spark("oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures, passed, rows_only = [], 0, 0
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        t0 = time.perf_counter()
        rec = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        report[name] = rec
        try:
            sdf = fn(spark, sf_dir).toPandas()
            rec["spark_rows"] = len(sdf)
        except Exception as exc:
            rec["err"] = f"SPARK ERROR: {exc}"
            failures.append((name, rec["err"]))
            print(f"✗ {name}: spark error {exc}")
            continue
        if name not in oracles:
            rows_only += 1
            rec["rows_match"] = rec["schema_match"] = True  # weak rows-only check
            rec["err"] = "rows-only (no oracle_sql entry)"
            print(f"~ {name}: rows-only ({len(sdf)} rows, {time.perf_counter()-t0:.1f}s)")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
            rec["oracle_rows"] = len(ddf)
        except Exception as exc:
            rec["err"] = f"DUCKDB ERROR: {exc}"
            failures.append((name, rec["err"]))
            print(f"✗ {name}: duckdb error {exc}")
            continue
        problems = []
        rec["schema_match"] = sorted(map(str.lower, sdf.columns)) == sorted(
            map(str.lower, ddf.columns)
        )
        rec["rows_match"] = len(sdf) == len(ddf)
        if not rec["schema_match"]:
            problems.append(f"columns {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
        elif not rec["rows_match"]:
            problems.append(f"rows {len(sdf)} vs {len(ddf)}")
        else:
            ddf.columns = [c.lower() for c in ddf.columns]
            sdf.columns = [c.lower() for c in sdf.columns]
            a, b = normalize(sdf), normalize(ddf)
            rec["hash_match"] = a == b
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, e.g. {diff}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"✗ {name}: {problems}")
        else:
            passed += 1
            print(f"✓ {name} ({len(sdf)} rows, {time.perf_counter()-t0:.1f}s)")

    if not name_filter:
        import json

        out = REPO / "CORRECTNESS_local.json"
        out.write_text(json.dumps(report, indent=2))
        print(f"wrote {out}")
    print(f"\n{passed} passed, {rows_only} rows-only, {len(failures)} failed")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
