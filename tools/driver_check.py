"""Local replica of the driver's correctness gate.

Runs entry(spark) as a smoke check, then every queries()[name] at the
given sf against oracle_sql()[name] in DuckDB (views pre-registered
from the parquet files), comparing row count, column names, and an
order-insensitive value comparison. Exit 1 on any mismatch.

Usage: python tools/driver_check.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from documentindex_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


class NonScalarColumnError(TypeError):
    """A queries()/oracle result column holds list/dict/array cells —
    the REAL driver's pandas lexsort canonicalizer dies on these
    (`unhashable type: 'list'`), so the replica must reject them too
    instead of silently coercing (round-2 red row `evidence_excerpts`
    shipped through exactly that divergence)."""


def _assert_scalar(df: pd.DataFrame) -> None:
    import numpy as np

    for c in df.columns:
        if df[c].dtype != object:
            continue
        bad = df[c].map(
            lambda v: isinstance(v, (list, tuple, dict, set, np.ndarray))
        )
        if bad.any():
            example = df[c][bad].iloc[0]
            raise NonScalarColumnError(
                f"column {c!r} has non-scalar cells "
                f"(e.g. {type(example).__name__}: {example!r}); the real "
                f"driver canonicalizer cannot sort/hash these — return "
                f"scalar rows (posexplode arrays, json-encode structs)"
            )


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    _assert_scalar(df)
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[ns]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("driver-check", master="local[8]", shuffle_partitions=8)

    t0 = time.time()
    out = entrymod.entry(spark)
    rows = out.collect()
    print(f"entry(): {len(rows)} rows, schema={out.schema.simpleString()}, "
          f"{time.time()-t0:.1f}s")
    assert len(rows) >= 0

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        t0 = time.time()
        got = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            _assert_scalar(got)
            print(f"  {name}: rows-only check, {len(got)} rows, "
                  f"{time.time()-t0:.1f}s")
            continue
        want = con.execute(oracles[name]).df()
        g, w = normalize(got), normalize(want)
        ok_rows = len(g) == len(w)
        ok_cols = list(g.columns) == list(w.columns)
        ok_vals = ok_rows and ok_cols and g.equals(w)
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        print(f"  {name}: {status} rows={len(g)}/{len(w)} cols={ok_cols} "
              f"vals={ok_vals} {time.time()-t0:.1f}s")
        if status == "FAIL":
            failed.append(name)
            print("   spark:", g.head(5).to_dict("records"))
            print("   duckdb:", w.head(5).to_dict("records"))
            if ok_rows and ok_cols:
                diff = (g != w).any(axis=1)
                print("   first diffs:", g[diff].head(3).to_dict("records"),
                      w[diff].head(3).to_dict("records"))
    print("FAILED:" if failed else "ALL OK", failed)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
