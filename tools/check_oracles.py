"""Local simulation of the driver's correctness gate: run every
``__ray_entry__.queries()`` entry and its DuckDB oracle side-by-side and
compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def to_pandas(result):
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def normalize(df):
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    import duckdb
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    ray.init(
        address="local",
        num_cpus=8,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"unknown query names: {sorted(unknown)}")
        return 2
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = normalize(to_pandas(fn(sf_dir)))
        except Exception as exc:  # noqa: BLE001
            print(f"[ERR ] {name}: query raised {type(exc).__name__}: {exc}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"[rows] {name}: {len(got)} rows (no SQL oracle — rows-only)")
            continue
        try:
            exp = normalize(con.sql(oracles[name]).df())
        except Exception as exc:  # noqa: BLE001
            print(f"[ERR ] {name}: oracle raised {type(exc).__name__}: {exc}")
            failures.append(name)
            continue
        if list(got.columns) != list(exp.columns):
            print(f"[FAIL] {name}: columns {list(got.columns)} != {list(exp.columns)}")
            failures.append(name)
        elif len(got) != len(exp):
            print(f"[FAIL] {name}: rows {len(got)} != {len(exp)}")
            failures.append(name)
        elif not got.equals(exp):
            neq = (got != exp).any(axis=1)
            print(f"[FAIL] {name}: {int(neq.sum())} differing rows")
            print("  got:", got[neq].head(3).to_dict("records"))
            print("  exp:", exp[neq].head(3).to_dict("records"))
            failures.append(name)
        else:
            print(f"[ OK ] {name}: {len(got)} rows match")
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
