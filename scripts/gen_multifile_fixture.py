"""Build a multi-file (directory-per-table) variant of a fixture dir.

Round-10 stress rung: every prior tier kept the driver's one-file-per-
table layout, but at 100 TB every table is a DIRECTORY of part files —
that is the layout `spark.read.parquet` sees on a real cluster, and the
repo's streaming replay machinery grew single-file assumptions
(`os.path.getsize`, `shutil.copy`, `pq.ParquetFile`) that a fixture can
only falsify if one exists. This script rewrites each `<t>.parquet`
FILE into a `<t>.parquet/` directory of N interleaved part files:

- part k holds rows where row_index % N == k, so Spark's file-listing
  order differs from the original row order — any operator whose result
  depends on encounter order (instead of data) fails the oracle here.
- N defaults to min(nrows, 16) for the broadcast dims and
  min(nrows, 48) for the fact tables — small files, many of them,
  the unflattering-but-real shape of an ingested landing zone.

Output dir is rebuilt from scratch (a stale half-built dir silently
serving old parts was ADVICE r9 on the skew probe — same lesson).

Usage:
    python scripts/gen_multifile_fixture.py [SRC] [OUT]
defaults: SRC=/root/testdata/sf0.01  OUT=<repo>/.stress/sf0.01multi
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()
DIMS = {"region", "nation", "customer", "supplier", "part"}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, ".stress", os.path.basename(src.rstrip("/")) + "multi")
    )
    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)
    for t in TABLES:
        table = pq.read_table(f"{src.rstrip('/')}/{t}.parquet")
        n = min(table.num_rows, 16 if t in DIMS else 48)
        tdir = f"{out}/{t}.parquet"
        os.makedirs(tdir)
        idx = list(range(table.num_rows))
        for k in range(n):
            part = table.take(idx[k::n])
            pq.write_table(part, f"{tdir}/part-{k:05d}.parquet")
        print(f"{t}: {table.num_rows} rows -> {n} part files")
    print(f"multi-file fixture at {out}")


if __name__ == "__main__":
    main()
