"""Local replica of the driver's correctness gate: run each queries() entry
at a given sf and compare row-count + schema + order-insensitive value hash
against oracle_sql() via DuckDB.  Usage:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

import hashlib
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents"
    " embeddings".split()
)


def to_pandas(result):
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main():
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"{name:>20}: QUERY ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name:>20}: rows-only  rows={len(got)} cols={sorted(got.columns)}")
            continue
        want = con.execute(oracles[name]).df()
        ok_rows = len(got) == len(want)
        ok_schema = sorted(got.columns) == sorted(want.columns)
        gh, wh = value_hash(got), value_hash(want)
        ok_hash = gh == wh
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "MISMATCH"
        print(
            f"{name:>20}: {status} rows={len(got)}/{len(want)}"
            f" schema={'ok' if ok_schema else f'{sorted(got.columns)} vs {sorted(want.columns)}'}"
            f" hash={'ok' if ok_hash else f'{gh[:8]} vs {wh[:8]}'}"
        )
        if status != "OK":
            failures += 1
            if not ok_hash and ok_schema and ok_rows:
                merged = got.sort_values(sorted(got.columns)).reset_index(drop=True)
                wanted = want.sort_values(sorted(want.columns)).reset_index(drop=True)
                diff = (merged != wanted).any(axis=1)
                print(merged[diff].head(3))
                print(wanted[diff].head(3))
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
