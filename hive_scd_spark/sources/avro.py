"""Avro source with native-first, pure-Python-fallback strategy.

``spark.read.format("avro")`` requires the external ``spark-avro``
package jar; when it is on the classpath we use it (scales to any data
size, full pushdown).  When absent — as in a pip-installed PySpark —
we fall back to :mod:`hive_scd_spark.sources.avro_lite`, which decodes
the reference's flat type set driver-side and hands Spark an Arrow-built
DataFrame.  Reader-schema evolution (field defaults) is honored on both
paths, matching ``AvroSCDInputFormat.java:141-154``.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame, SparkSession

from hive_scd_spark.sources import avro_lite

_NATIVE_AVRO: bool | None = None


def _native_avro_available(spark: SparkSession) -> bool:
    global _NATIVE_AVRO
    if _NATIVE_AVRO is None:
        try:
            # resolves only if the spark-avro data source is registered
            spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(  # type: ignore[union-attr]
                "avro", spark._jsparkSession.sessionState().conf()
            )
            _NATIVE_AVRO = True
        except Exception:
            _NATIVE_AVRO = False
    return _NATIVE_AVRO


def _normalize_reader_schema(reader_schema) -> dict | None:
    if reader_schema is None:
        return None
    if isinstance(reader_schema, str):
        return json.loads(reader_schema)
    if isinstance(reader_schema, dict):
        return reader_schema
    return None  # a Spark StructType — native path handles via .schema()


def read_avro(
    spark: SparkSession, path, reader_schema=None, options=None
) -> DataFrame:
    """Read Avro container file(s) at *path* (file, dir, or list)."""
    options = dict(options or {})
    avro_json = _normalize_reader_schema(reader_schema)
    if _native_avro_available(spark):
        reader = spark.read.format("avro").options(**options)
        if avro_json is not None:
            reader = reader.option("avroSchema", json.dumps(avro_json))
        elif reader_schema is not None:
            reader = reader.schema(reader_schema)
        return reader.load(path)

    # pure-Python fallback (driver-side decode; dimension-sized data)
    paths = path if isinstance(path, (list, tuple)) else [path]
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(
                sorted(
                    f
                    for f in glob.glob(os.path.join(p, "*"))
                    if os.path.isfile(f)
                    and not os.path.basename(f).startswith((".", "_"))
                )
            )
        else:
            files.append(p)
    all_rows: list[dict] = []
    writer_schema: dict | None = None
    for f in files:
        schema, rows = avro_lite.read_container(f)
        writer_schema = writer_schema or schema
        if avro_json is not None:
            rows = avro_lite.resolve_rows(rows, avro_json)
        all_rows.extend(rows)
    effective = avro_json or writer_schema
    if effective is None:
        raise FileNotFoundError(f"No Avro files found under {path!r}")
    struct = avro_lite.schema_to_struct(effective)
    return spark.createDataFrame(all_rows, schema=struct)
