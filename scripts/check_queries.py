"""Ad-hoc driver-gate replica: run named queries() entries vs oracle_sql()
at a given sf dir (default sf0.01, the driver's scale).

Usage: python scripts/check_queries.py [sf_dir] [name ...]

Also importable: :func:`check_queries` is the compare the overflow
pytest gate (tests/test_driver_overflow.py) runs, so registry entries
beyond the driver's 50-query cap stay hard-gated.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


def check_queries(
    spark, sf_dir: str, names: list[str], verbose: bool = True
) -> list[str]:
    """Run each named queries() entry against its oracle_sql() twin the
    way the driver does (schema, rows, per-column values). Returns the
    failing names (empty == all green)."""
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = entrymod.oracle_sql()
    qs = entrymod.queries()
    failed = []
    for name in names:
        got = qs[name](spark, sf_dir).toPandas()
        if name not in oracles:
            if verbose:
                print(f"{name}: rows={len(got)} (no oracle)")
            continue
        want = con.execute(oracles[name]).df()
        status = []
        if sorted(got.columns) != sorted(want.columns):
            status.append(f"SCHEMA {sorted(got.columns)} vs {sorted(want.columns)}")
        if len(got) != len(want):
            status.append(f"ROWS {len(got)} vs {len(want)}")
        if not status:
            g, w = canon(got), canon(want)
            for col in g.columns:
                gv, wv = g[col], w[col]
                try:
                    if gv.dtype.kind == "f" or wv.dtype.kind == "f":
                        ok = np.allclose(gv.astype(float), wv.astype(float),
                                         atol=1e-9, equal_nan=True)
                    else:
                        ok = gv.astype(object).tolist() == wv.astype(object).tolist()
                except Exception as e:  # noqa: BLE001
                    ok = False
                    status.append(f"COMPARE-ERR {col}: {e}")
                    continue
                if not ok:
                    status.append(f"VALUES {col}")
        if status:
            failed.append(name)
            if verbose:
                print(f"{name}: FAIL  {'; '.join(status)}")
        elif verbose:
            print(f"{name}: ok rows={len(got)}")
    return failed


def main() -> int:
    import __spark_entry__ as entrymod
    from spcht_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or sorted(entrymod.queries().keys())
    spark = get_spark()
    failed = check_queries(spark, sf_dir, names)
    print(f"\n{len(names) - len(failed)}/{len(names)} green")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
