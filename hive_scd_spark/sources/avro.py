"""Avro source with native-first, distributed-pure-Python-fallback.

``spark.read.format("avro")`` requires the external ``spark-avro``
package jar; when it is on the classpath we use it (full pushdown,
block-level splits).  When absent — as in a pip-installed PySpark — we
fall back to a DISTRIBUTED decode: ``binaryFile`` scan (one task per
container file, dot/underscore files skipped by Spark itself, so
``.updates`` never reaches the decoder) + Arrow-batched ``mapInPandas``
running :mod:`hive_scd_spark.sources.avro_lite` on the executors.  The
driver touches only the header bytes of ONE file (schema sniff); no
row data is ever materialized driver-side, so the fallback scales with
the cluster — parallelism unit is the file, the same granularity a
1000-file SCD table gives the reference's per-split InputFormat
(``AvroSCDInputFormat.java:51-59``).

Reader-schema evolution (field defaults) is honored on both paths,
matching ``AvroSCDInputFormat.java:141-154``.  A Spark ``StructType``
reader schema is accepted on both paths too: on the fallback it is
converted to an equivalent flat Avro record (nullable field → union
with null + null default), rather than being silently dropped.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from hive_scd_spark.fs import fs_for
from hive_scd_spark.sources import avro_lite

_NATIVE_AVRO: dict[str, bool] = {}  # keyed per application — classpaths can differ


def _native_avro_available(spark: SparkSession) -> bool:
    app_id = spark.sparkContext.applicationId
    if app_id not in _NATIVE_AVRO:
        try:
            # resolves only if the spark-avro data source is registered
            spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(  # type: ignore[union-attr]
                "avro", spark._jsparkSession.sessionState().conf()
            )
            _NATIVE_AVRO[app_id] = True
        except Exception:
            _NATIVE_AVRO[app_id] = False
    return _NATIVE_AVRO[app_id]


_SPARK_TO_AVRO = {
    T.BooleanType: "boolean",
    T.IntegerType: "int",
    T.LongType: "long",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.StringType: "string",
    T.BinaryType: "bytes",
}


def _struct_to_avro_json(struct: T.StructType) -> dict:
    """Spark StructType → flat Avro record (the reference's six
    primitives + bytes — ``AvroSCDInputFormat.java:156-178``).
    Nullable fields become ``["null", t]`` with a null default, so a
    reader column absent from old files resolves to NULL."""
    fields = []
    for f in struct.fields:
        avro_t = _SPARK_TO_AVRO.get(type(f.dataType))
        if avro_t is None:
            raise NotImplementedError(
                f"StructType reader schema field {f.name!r}: type "
                f"{f.dataType.simpleString()} has no flat Avro equivalent; "
                "pass an Avro-JSON reader schema instead"
            )
        if f.nullable:
            fields.append({"name": f.name, "type": ["null", avro_t], "default": None})
        else:
            fields.append({"name": f.name, "type": avro_t})
    return {"type": "record", "name": "reader", "fields": fields}


def _normalize_reader_schema(reader_schema) -> dict | None:
    if reader_schema is None:
        return None
    if isinstance(reader_schema, str):
        return json.loads(reader_schema)
    if isinstance(reader_schema, dict):
        return reader_schema
    if isinstance(reader_schema, T.StructType):
        return _struct_to_avro_json(reader_schema)
    raise TypeError(f"Unsupported reader schema type: {type(reader_schema)!r}")


def _sniff_writer_schema(spark: SparkSession, paths: list[str]) -> dict:
    """Writer schema from the header of the first data file — a
    metadata-sized driver read (same class of work as Spark's own
    parquet schema inference), growing the probe only if the header is
    unusually large."""
    for p in paths:
        fs = fs_for(spark, p)
        candidates: list[tuple[object, str]] = []
        if fs.is_file(p):
            candidates.append((fs, p))
        else:
            for dirpath, _dirs, files in fs.walk(p):
                for f in sorted(files):
                    if not f.startswith((".", "_")):
                        candidates.append((fs, fs.join(dirpath, f)))
                        break
                if candidates:
                    break
        for cfs, cpath in candidates:
            for probe in (1 << 20, 8 << 20, None):
                try:
                    return avro_lite.read_header_schema(cfs.read_head(cpath, probe))
                except Exception:
                    if probe is None:
                        raise
    raise FileNotFoundError(f"No Avro files found under {paths!r}")


def _decode_partition(reader_json: dict | None, out_cols: list[str]):
    """Build the executor-side mapInPandas function: each input row is
    one whole container file (binaryFile schema); output is the decoded
    rows.  Pure-Python per file, Arrow on the wire — no driver hop."""

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            for content in pdf["content"]:
                _writer, rows = avro_lite.read_container_bytes(bytes(content))
                if reader_json is not None:
                    rows = avro_lite.resolve_rows(rows, reader_json)
                yield pd.DataFrame(
                    [[row.get(c) for c in out_cols] for row in rows],
                    columns=out_cols,
                    dtype=object,
                )

    return fn


def read_avro(
    spark: SparkSession, path, reader_schema=None, options=None
) -> DataFrame:
    """Read Avro container file(s) at *path* (file, dir, or list)."""
    options = dict(options or {})
    if _native_avro_available(spark):
        reader = spark.read.format("avro").options(**options)
        if isinstance(reader_schema, T.StructType):
            # Native path takes the StructType directly — any Spark type
            # the avro data source supports (timestamp, decimal, arrays,
            # ...) works; do NOT round-trip through the flat-Avro-JSON
            # converter, which only knows the reference's six primitives.
            reader = reader.schema(reader_schema)
        else:
            avro_json = _normalize_reader_schema(reader_schema)
            if avro_json is not None:
                reader = reader.option("avroSchema", json.dumps(avro_json))
        return reader.load(path)

    # distributed fallback: binaryFile scan + mapInPandas decode; the
    # pure-Python codec is flat-primitive-only, so StructType→Avro-JSON
    # conversion (and its NotImplementedError for wider types) applies
    # only here
    avro_json = _normalize_reader_schema(reader_schema)
    paths = list(path) if isinstance(path, (list, tuple)) else [path]
    effective = avro_json if avro_json is not None else _sniff_writer_schema(spark, paths)
    if isinstance(reader_schema, T.StructType):
        struct = reader_schema  # keep the caller's exact Spark types
    else:
        struct = avro_lite.schema_to_struct(effective)
    binary = spark.read.format("binaryFile").load(paths)
    return binary.select("content").mapInPandas(
        _decode_partition(avro_json, [f.name for f in struct.fields]), schema=struct
    )
