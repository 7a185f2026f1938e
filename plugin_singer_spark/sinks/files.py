"""File parity sinks: one CSV / JSONL file per stream.

Reference semantics:
- CSV target (targets/Csv.java:52-98): one ``<stream>.csv`` per stream,
  configurable ``delimiter``/``quotechar`` (:41-65); the stream name is
  parsed back from the filename (:86-96).
- JSONL target (targets/Json.java:32-77): one ``<stream>.jsonl`` per
  stream, ``do_timestamp_file=false`` (:43) so names are stable.
- Compression: the pipelinewise targets stage compressed load files
  (``compression``, targets/PipelinewiseRedshift.java:269; gzip'd staged
  formats, targets/PipelinewiseSnowflake.java:292-296) — the engine's
  ``codec`` option maps onto Spark's writer compression. For the
  single-file parity artifacts only concat-safe codecs are allowed
  (gzip/bzip2: both formats define a file as a sequence of members, so a
  byte concat of part files is itself a valid compressed file).

These are the byte-parity sinks used by the reference's pipeline tests
(JsonTest.java:61-78, CsvTest.java:30-60: 8 category + 4 region rows in
files named by stream). The engine writes them with Spark's native
csv/json writers (distributed), then concatenates part files into the
single per-stream artifact the contract requires — the concat is
driver-side but streams at file granularity (no row materialization).

The parquet sink additionally takes ``partition_by`` (hive-style output
partitioning — the scale knob: downstream scans prune partitions) and any
parquet ``codec`` (snappy/zstd/gzip — splittable inside parquet regardless
of codec, so no concat-safety restriction applies).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, functions as F

# codecs whose on-disk format concatenates losslessly (multi-member files)
_CONCAT_SAFE = {"gzip": ".gz", "bzip2": ".bz2"}


def _text_ext(codec: str | None) -> str:
    if codec is None or codec == "none":
        return ""
    if codec not in _CONCAT_SAFE:
        raise ValueError(
            f"codec {codec!r} is not concat-safe for single-file text sinks; "
            f"use one of {sorted(_CONCAT_SAFE)} (or the parquet sink for "
            "snappy/zstd)"
        )
    return _CONCAT_SAFE[codec]


def _concat_parts(tmp_dir: str, out_path: str, header_lines: int = 0, ext: str = "") -> None:
    parts = sorted(glob.glob(os.path.join(tmp_dir, "part-*" + ext)))
    with open(out_path, "wb") as out:
        for i, p in enumerate(parts):
            with open(p, "rb") as f:
                if header_lines and i > 0:
                    for _ in range(header_lines):
                        f.readline()
                shutil.copyfileobj(f, out)
    shutil.rmtree(tmp_dir, ignore_errors=True)


def write_jsonl_streams(
    records_by_stream: dict[str, DataFrame], out_dir: str, codec: str | None = None
) -> dict[str, str]:
    """One ``<stream>.jsonl[.gz|.bz2]`` per stream (targets/Json.java:65-75).
    ``codec`` gzip/bzip2 compresses each part; the concat of compressed
    members is itself a valid compressed file."""
    ext = _text_ext(codec)
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for stream, df in records_by_stream.items():
        tmp = os.path.join(out_dir, f"_tmp_{stream}")
        w = df.write.mode("overwrite")
        if ext:
            w = w.option("compression", codec)
        w.json(tmp)
        out = os.path.join(out_dir, f"{stream}.jsonl{ext}")
        _concat_parts(tmp, out, ext=ext)
        paths[stream] = out
    return paths


def write_csv_streams(
    records_by_stream: dict[str, DataFrame],
    out_dir: str,
    delimiter: str = ",",
    quotechar: str = '"',
    header: bool = True,
    codec: str | None = None,
) -> dict[str, str]:
    """One ``<stream>.csv[.gz|.bz2]`` per stream (targets/Csv.java:41-65,
    86-96). The parity artifact is coalesced to a single ordered part, so
    the header survives compression (no cross-part header stripping)."""
    ext = _text_ext(codec)
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for stream, df in records_by_stream.items():
        tmp = os.path.join(out_dir, f"_tmp_{stream}")
        w = (
            df.coalesce(1)  # parity artifact: single ordered file per stream
            .write.mode("overwrite")
            .option("sep", delimiter)
            .option("quote", quotechar)
            .option("header", str(header).lower())
        )
        if ext:
            w = w.option("compression", codec)
        w.csv(tmp)
        out = os.path.join(out_dir, f"{stream}.csv{ext}")
        # single part (coalesce(1)) ⇒ no header stripping needed even gzip'd
        _concat_parts(tmp, out, header_lines=0, ext=ext)
        paths[stream] = out
    return paths


def write_parquet_streams(
    records_by_stream: dict[str, DataFrame],
    out_dir: str,
    codec: str | None = None,
    partition_by: list[str] | dict[str, list[str]] | None = None,
) -> dict[str, str]:
    """One ``<stream>.parquet/`` DIRECTORY per stream — the columnar
    variant of the per-stream file sinks. Unlike the csv/jsonl parity
    artifacts this stays a multi-part directory on purpose: parquet is
    splittable and the 100 TB use of this sink is handing a stream to the
    next Spark/DuckDB job, where a driver-side concat to one file would
    serialize the write and destroy scan parallelism downstream.

    ``codec`` is any parquet compression (snappy/zstd/gzip/none);
    ``partition_by`` writes hive-style partition directories so downstream
    scans prune on the partition columns — either one list applied to every
    stream that HAS those columns (streams missing a column are written
    unpartitioned) or a ``{stream: [cols]}`` dict for per-stream specs."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for stream, df in records_by_stream.items():
        out = os.path.join(out_dir, f"{stream}.parquet")
        w = df.write.mode("overwrite")
        if codec:
            w = w.option("compression", codec)
        spec = (
            partition_by.get(stream) if isinstance(partition_by, dict) else partition_by
        ) or []
        cols = [c for c in spec if c in df.columns]
        if cols:
            w = w.partitionBy(*cols)
        w.parquet(out)
        paths[stream] = out
    return paths


def stream_name_from_path(path: str) -> str:
    """targets/Csv.java:86-96 — stream name parsed from the filename
    (compression suffixes stripped)."""
    base = os.path.basename(path)
    for ext in (".gz", ".bz2"):
        if base.endswith(ext):
            base = base[: -len(ext)]
    return os.path.splitext(base)[0]
