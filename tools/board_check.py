"""Driver-protocol simulator: run queries() vs oracle_sql() side by side.

Mimics the round driver's correctness gate at sf0.01: for every query
key, execute the Ray pipeline AND the DuckDB oracle SQL over the same
parquet tables, sort columns by name, canonicalize row order, and
compare row count + schema + a value hash. Usage:

    python tools/board_check.py              # full board
    python tools/board_check.py q1 q2 ...    # subset

Prints one line per query and a final summary; exit code 1 on any
mismatch. Owns its own Ray session (the real driver inits Ray itself).
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon(df):
    import numpy as np
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = np.round(s.astype("float64"), 6)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("int64")
        else:
            df[c] = s.astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _vhash(df) -> str:
    import pandas as pd

    return hashlib.sha256(
        pd.util.hash_pandas_object(df, index=False).values.tobytes()
    ).hexdigest()[:16]


def main(argv: list[str]) -> int:
    import duckdb
    import pandas as pd

    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    keys = argv or list(qs)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    n_green = n_rows_only = n_fail = 0
    for name in keys:
        if name not in qs:
            print(f"{name}: NOT A QUERY")
            n_fail += 1
            continue
        try:
            out = qs[name](SF_DIR)
            if hasattr(out, "to_pandas"):
                out = out.to_pandas()
            ray_df = _canon(pd.DataFrame(out))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: RAY ERROR {type(e).__name__}: {e}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"{name}: rows_only n={len(ray_df)}")
            n_rows_only += 1
            continue
        try:
            ora_df = _canon(con.execute(sql).fetchdf())
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = []
        if len(ray_df) != len(ora_df):
            problems.append(f"rows {len(ray_df)} vs {len(ora_df)}")
        if list(ray_df.columns) != list(ora_df.columns):
            problems.append(f"cols {list(ray_df.columns)} vs {list(ora_df.columns)}")
        if not problems and _vhash(ray_df) != _vhash(ora_df):
            diff = (ray_df != ora_df).any(axis=1)
            problems.append(f"values differ on {int(diff.sum())} rows")
        if problems:
            print(f"{name}: MISMATCH {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"{name}: green n={len(ray_df)}")
            n_green += 1
    print(f"-- board: {n_green} green, {n_rows_only} rows_only, {n_fail} FAIL")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
