"""Rewrite the test-lake parquet files with multiple row groups (r12,
verdict item 5).

Every test-lake table is a single parquet file with ONE row group, so no
scan stage can ever exceed 1 task locally and the driver's 8-vs-32-core
scaling block reads ≈1 for everything (PERF_r11.json). This rewrites
each file IN PLACE with bounded row-group sizes while preserving the
logical content byte-for-byte:

- rows, row ORDER, schema, and column types are untouched (read with
  pyarrow, write the same Table back) — the DuckDB oracle reads the same
  files, so the full 227-query parity suite proves content identity;
- only the physical chunking (row groups) and therefore available scan
  parallelism changes.

Row-group sizing: aim for ~32 groups on the biggest table (one per
core), floor 2048 rows so tiny tables stay single-group (splitting a
25-row dim is pure overhead).

    python scripts_dev/rewrite_lake_rowgroups.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq


def rewrite(path: str, target_groups: int = 32, min_rows: int = 2048) -> str:
    pf = pq.ParquetFile(path)
    meta = pf.metadata
    n = meta.num_rows
    rows_per_group = max(min_rows, (n + target_groups - 1) // target_groups)
    if meta.num_row_groups >= (n + rows_per_group - 1) // rows_per_group:
        return f"{os.path.basename(path)}: already {meta.num_row_groups} groups, skip"
    table = pf.read()
    tmp = path + ".rgtmp"
    # snappy matches the generator's codec; stats on so min/max pruning
    # keeps working per group
    pq.write_table(
        table,
        tmp,
        row_group_size=rows_per_group,
        compression="snappy",
        write_statistics=True,
    )
    # sanity: identical logical content before replacing
    new = pq.ParquetFile(tmp).read()
    if not new.equals(table):
        os.unlink(tmp)
        raise SystemExit(f"content mismatch rewriting {path}")
    mode = os.stat(path).st_mode
    os.replace(tmp, path)
    os.chmod(path, mode)
    groups = pq.ParquetFile(path).metadata.num_row_groups
    return (
        f"{os.path.basename(path)}: {n} rows -> {groups} groups "
        f"({rows_per_group} rows/group)"
    )


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    for d in dirs:
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                print(rewrite(os.path.join(d, f)))


if __name__ == "__main__":
    main()
