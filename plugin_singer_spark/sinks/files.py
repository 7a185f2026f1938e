"""File parity sinks: one CSV / JSONL file per stream.

Reference semantics:
- CSV target (targets/Csv.java:52-98): one ``<stream>.csv`` per stream,
  configurable ``delimiter``/``quotechar`` (:41-65); the stream name is
  parsed back from the filename (:86-96).
- JSONL target (targets/Json.java:32-77): one ``<stream>.jsonl`` per
  stream, ``do_timestamp_file=false`` (:43) so names are stable.

These are the byte-parity sinks used by the reference's pipeline tests
(JsonTest.java:61-78, CsvTest.java:30-60: 8 category + 4 region rows in
files named by stream). The engine writes them with Spark's native
csv/json writers (distributed), then concatenates part files into the
single per-stream artifact the contract requires — the concat is
driver-side but streams at file granularity (no row materialization).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, functions as F


def _concat_parts(tmp_dir: str, out_path: str, header_lines: int = 0) -> None:
    parts = sorted(glob.glob(os.path.join(tmp_dir, "part-*")))
    with open(out_path, "wb") as out:
        for i, p in enumerate(parts):
            with open(p, "rb") as f:
                if header_lines and i > 0:
                    for _ in range(header_lines):
                        f.readline()
                shutil.copyfileobj(f, out)
    shutil.rmtree(tmp_dir, ignore_errors=True)


def write_jsonl_streams(
    records_by_stream: dict[str, DataFrame], out_dir: str
) -> dict[str, str]:
    """One ``<stream>.jsonl`` per stream (targets/Json.java:65-75)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for stream, df in records_by_stream.items():
        tmp = os.path.join(out_dir, f"_tmp_{stream}")
        df.write.mode("overwrite").json(tmp)
        out = os.path.join(out_dir, f"{stream}.jsonl")
        _concat_parts(tmp, out)
        paths[stream] = out
    return paths


def write_csv_streams(
    records_by_stream: dict[str, DataFrame],
    out_dir: str,
    delimiter: str = ",",
    quotechar: str = '"',
    header: bool = True,
) -> dict[str, str]:
    """One ``<stream>.csv`` per stream (targets/Csv.java:41-65,86-96)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for stream, df in records_by_stream.items():
        tmp = os.path.join(out_dir, f"_tmp_{stream}")
        (
            df.coalesce(1)  # parity artifact: single ordered file per stream
            .write.mode("overwrite")
            .option("sep", delimiter)
            .option("quote", quotechar)
            .option("header", str(header).lower())
            .csv(tmp)
        )
        out = os.path.join(out_dir, f"{stream}.csv")
        _concat_parts(tmp, out, header_lines=1 if header else 0)
        paths[stream] = out
    return paths


def write_parquet_streams(
    records_by_stream: dict[str, DataFrame], out_dir: str
) -> dict[str, str]:
    """One ``<stream>.parquet/`` DIRECTORY per stream — the columnar
    variant of the per-stream file sinks. Unlike the csv/jsonl parity
    artifacts this stays a multi-part directory on purpose: parquet is
    splittable and the 100 TB use of this sink is handing a stream to the
    next Spark/DuckDB job, where a driver-side concat to one file would
    serialize the write and destroy scan parallelism downstream."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for stream, df in records_by_stream.items():
        out = os.path.join(out_dir, f"{stream}.parquet")
        df.write.mode("overwrite").parquet(out)
        paths[stream] = out
    return paths


def stream_name_from_path(path: str) -> str:
    """targets/Csv.java:86-96 — stream name parsed from the filename."""
    return os.path.splitext(os.path.basename(path))[0]
