"""Driver-compare harness used during development: runs named queries
and their DuckDB oracles side by side the way the round driver does
(sorted columns, sorted rows, value hash) and prints pass/fail.

Usage: python tests/_drivercheck.py [sf_dir] [query ...]
"""

import hashlib
import sys

import duckdb
import pandas as pd
import pyarrow as pa


TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res):
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    return hashlib.sha256(
        pd.util.hash_pandas_object(canon(df), index=False).values.tobytes()
    ).hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    from don_crawler_ray.pipelines.queries import ORACLE_SQL, QUERIES

    names = sys.argv[2:] or [n for n in QUERIES if n in ORACLE_SQL]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name in names:
        if name not in ORACLE_SQL:
            print(f"{name}: SKIP (no oracle)")
            continue
        try:
            mine = canon(to_pandas(QUERIES[name](sf_dir)))
            oracle = canon(con.execute(ORACLE_SQL[name]).fetch_df())
            rows = len(mine) == len(oracle)
            schema = list(mine.columns) == list(oracle.columns) and all(
                str(a) == str(b) for a, b in zip(mine.dtypes, oracle.dtypes)
            )
            h = value_hash(mine) == value_hash(oracle) if rows and schema else False
            ok = rows and schema and h
            if not ok:
                failures += 1
                print(f"{name}: FAIL rows={rows}({len(mine)}/{len(oracle)}) schema={schema} hash={h}")
                if not schema:
                    print("  mine  ", list(zip(mine.columns, map(str, mine.dtypes))))
                    print("  oracle", list(zip(oracle.columns, map(str, oracle.dtypes))))
            else:
                print(f"{name}: OK ({len(mine)} rows)")
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"{name}: ERROR {type(e).__name__}: {e}")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
