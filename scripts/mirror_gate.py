"""Standalone mirror of the driver's correctness gate at an arbitrary SF.

Usage: python scripts/mirror_gate.py [sf_dir]   (default /root/testdata/sf0.01)

Runs every queries() entry against its oracle_sql() via DuckDB, comparing
rows / column names / type-strict values exactly like tests/util.py (which
itself mirrors the driver's sorted-column value hash). Prints one line per
query and a summary; exit code 1 on any mismatch.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main() -> int:
    args = list(sys.argv[1:])
    only: set[str] = set()
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1:])
        args = args[:i]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    import logging

    logging.getLogger("ray").setLevel(logging.ERROR)
    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 log_to_driver=False)

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        NO_ORACLE,
        ORACLE_SQL,
        QUERIES,
    )
    from tests.util import assert_frames_equal_unordered, to_pandas

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    failures: list[str] = []
    names = sorted(only & set(QUERIES)) if only else sorted(QUERIES)
    unknown = only - set(QUERIES)
    if unknown:
        print(f"unknown --only names: {sorted(unknown)}")
        return 1
    for name in names:
        try:
            result = QUERIES[name](sf_dir)
            if name in NO_ORACLE:
                n = len(to_pandas(result))
                print(f"  {name:28s} rows-only  ({n} rows)")
                continue
            expected = con.sql(ORACLE_SQL[name]).arrow()
            assert_frames_equal_unordered(result, expected, check_types=True)
            print(f"  {name:28s} PASS       ({expected.num_rows} rows)")
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            msg = str(e).split("\n")[0][:160]
            print(f"  {name:28s} FAIL       {msg}")

    print(f"\n{len(names) - len(failures)}/{len(names)} green at {sf_dir}")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
