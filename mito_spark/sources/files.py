"""Local-file scan functions and MIME decoders.

Reference surface (/root/reference/lib/file.go, lib/mime.go):
  file(path)        → bytes                 (file.go:191-201)
  file(path, mime)  → decoded value         (file.go:203-253)
  dir(path)         → list of entry maps    (file.go:160-189)
  mime transforms: gzip, zip, text/csv ± header, application/x-ndjson
                   (registry mito.go:276-284, lib/mime.go)

Spark-first mapping: files are read with the distributed readers
(binaryFile / csv / json / text), so a "file" is never driver-side
bytes — at 100 TB these are partitioned scans with pushdown. The
MIME registry maps content types to reader strategies; zip is the one
format with no native reader (binaryFile + a per-file Python expansion
— zips are inherently non-splittable, so per-file parallelism is the
correct distribution grain anyway).
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def read_file_bytes(spark: SparkSession, path: str) -> DataFrame:
    """``file(path)`` → one row per file with content bytes + metadata
    (path, modificationTime, length). Distributed binaryFile scan —
    globs and directories fan out across executors."""
    return spark.read.format("binaryFile").load(path)


def read_dir(spark: SparkSession, path: str) -> DataFrame:
    """``dir(path)`` (file.go:160-189) → (name, size, mod_time) per
    entry, name-sorted like the reference (file.go:174). Metadata-only
    projection of a binaryFile scan: content column is pruned away, so
    no file bytes are read."""
    df = spark.read.format("binaryFile").load(path)
    return (
        df.select(
            F.element_at(F.split(F.col("path"), "/"), -1).alias("name"),
            F.col("length").alias("size"),
            F.col("modificationTime").alias("mod_time"),
        )
        .orderBy("name")
    )


def read_csv(
    spark: SparkSession, path: str, header: bool = True, infer: bool = False
) -> DataFrame:
    """``file(path, 'text/csv; header=present|absent')``
    (mime.go:145-230). Reference semantics: all values stay strings
    (CSVHeader → list<map<string,string>>); pass infer=True for typed
    columns as the Spark-native extension."""
    return (
        spark.read.option("header", header)
        .option("inferSchema", infer)
        .csv(path)
    )


def read_ndjson(
    spark: SparkSession, path: str, schema=None, error_column: str = "error_message"
) -> DataFrame:
    """``file(path, 'application/x-ndjson')`` (mime.go:232-314):
    newline-delimited JSON where malformed lines become in-band error
    values instead of failing the scan — the reference inserts
    {"error.message": ...} rows; we surface the corrupt line in
    ``error_column`` (error-as-value convention, SURVEY §1.2)."""
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", error_column
    )
    if schema is not None:
        df = reader.json(path, schema=schema)
    else:
        df = reader.json(path)
    return df


def read_gzip_text(spark: SparkSession, path: str) -> DataFrame:
    """gzip transform (mito.go:279): Spark's text/json/csv readers
    decompress .gz transparently via the codec registry — a gzipped
    NDJSON/CSV file needs no special handling, just the same reader."""
    return spark.read.text(path)


ZIP_ENTRY_SCHEMA = StructType(
    [
        StructField("archive", StringType()),
        StructField("name", StringType()),
        StructField("size", LongType()),
        StructField("is_dir", BooleanType()),
        StructField("data", BinaryType()),
    ]
)


def read_zip(spark: SparkSession, path: str) -> DataFrame:
    """``file(path, 'application/zip')`` (mime.go:316-429) → one row
    per archive entry with Data bytes + metadata.

    Zip has no native Spark reader and the format is not splittable:
    the correct scale grain is one task per archive, which is exactly
    what binaryFile + mapInPandas gives (many archives → many tasks).
    Entries stream out per batch; a single huge archive is bounded by
    executor memory — matching the reference, which also buffers one
    archive (mime.go:367).
    """
    files = spark.read.format("binaryFile").load(path)

    def _expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"archive": [], "name": [], "size": [], "is_dir": [], "data": []}
            for fpath, content in zip(pdf["path"], pdf["content"]):
                with zipfile.ZipFile(io.BytesIO(bytes(content))) as zf:
                    for info in zf.infolist():
                        out["archive"].append(fpath)
                        out["name"].append(info.filename)
                        out["size"].append(info.file_size)
                        out["is_dir"].append(info.is_dir())
                        out["data"].append(b"" if info.is_dir() else zf.read(info))
            yield pd.DataFrame(out)

    return files.select("path", "content").mapInPandas(_expand, ZIP_ENTRY_SCHEMA)


# MIME registry (mito.go:276-284): content-type → reader strategy.
MIME_READERS = {
    "text/csv; header=present": lambda spark, path: read_csv(spark, path, header=True),
    "text/csv; header=absent": lambda spark, path: read_csv(spark, path, header=False),
    "application/x-ndjson": read_ndjson,
    "application/gzip": read_gzip_text,
    "application/zip": read_zip,
    "application/octet-stream": read_file_bytes,
}


def register_mime(mime: str, reader) -> None:
    """Host-extensible transform registry (the reference's
    Mime/transforms registration, lib/file.go:105-107, mito.go:276-284):
    reader is (spark, path) -> DataFrame."""
    MIME_READERS[mime] = reader


def read_mime(spark: SparkSession, path: str, mime: str) -> DataFrame:
    """``file(path, mime)`` dispatch (file.go:203-253). Unknown type →
    ValueError listing registered transforms, mirroring the reference's
    registry error."""
    if mime not in MIME_READERS:
        raise ValueError(f"no transform for MIME type {mime!r}; registered: {sorted(MIME_READERS)}")
    return MIME_READERS[mime](spark, path)
