"""avro_lite container roundtrip across the reference type set
(SURVEY §1.2) including union[null,T] and codecs, plus the combined
partitioned + schema-evolved + as-of integration."""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hive_scd_spark.sources.avro_lite import (
    read_container,
    resolve_rows,
    schema_to_struct,
    write_container,
)

SCHEMA = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "b", "type": ["null", "boolean"]},
        {"name": "i", "type": ["null", "int"]},
        {"name": "l", "type": ["null", "long"]},
        {"name": "f", "type": ["null", "float"]},
        {"name": "d", "type": ["null", "double"]},
        {"name": "s", "type": ["null", "string"]},
        {"name": "by", "type": ["null", "bytes"]},
    ],
}

row_st = st.fixed_dictionaries(
    {
        "b": st.none() | st.booleans(),
        "i": st.none() | st.integers(-(2**31), 2**31 - 1),
        "l": st.none() | st.integers(-(2**62), 2**62),
        "f": st.none() | st.sampled_from([0.0, 1.5, -3.25, 1e10]),
        "d": st.none() | st.sampled_from([0.0, -1.5, 3.14159, 1e300]),
        "s": st.none() | st.text(max_size=40),
        "by": st.none() | st.binary(max_size=20),
    }
)


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(row_st, max_size=20), codec=st.sampled_from(["null", "deflate", "snappy"]))
def test_container_roundtrip(tmp_path_factory, rows, codec):
    path = str(tmp_path_factory.mktemp("avro") / "t.avro")
    write_container(path, SCHEMA, rows, codec=codec)
    schema, got = read_container(path)
    assert schema == SCHEMA
    assert got == rows


def test_resolution_drops_and_defaults(tmp_path):
    path = str(tmp_path / "t.avro")
    write_container(
        path,
        {"type": "record", "name": "t", "fields": [
            {"name": "keep", "type": "int"},
            {"name": "dropped", "type": "string"},
        ]},
        [{"keep": 1, "dropped": "x"}],
    )
    _, rows = read_container(path)
    reader = {"type": "record", "name": "t", "fields": [
        {"name": "keep", "type": "int"},
        {"name": "added", "type": "string", "default": "dflt"},
    ]}
    assert resolve_rows(rows, reader) == [{"keep": 1, "added": "dflt"}]
    with pytest.raises(ValueError, match="no default"):
        resolve_rows(rows, {"type": "record", "name": "t", "fields": [
            {"name": "missing_no_default", "type": "int"}]})


def test_partitioned_evolved_asof_integration(spark, tmp_path):
    """All three SCD axes at once: partition-scoped scripts + reader
    schema evolution + as-of selection."""
    from hive_scd_spark.scd import read_scd

    on_disk = {"type": "record", "name": "t", "fields": [
        {"name": "id", "type": "int"}]}
    reader = json.dumps({"type": "record", "name": "t", "fields": [
        {"name": "id", "type": "int"},
        {"name": "status", "type": "string", "default": "new"}]})
    for part, ids, script in [
        ("p=1", [1, 2], "-- time=2024-01-01\nUPDATE t SET status = 'hot' WHERE id = 1;"),
        ("p=2", [3, 4], "-- time=2025-01-01\nDELETE FROM t WHERE id = 4;"),
    ]:
        d = tmp_path / part
        d.mkdir()
        write_container(str(d / "x.avro"), on_disk, [{"id": i} for i in ids])
        (d / ".updates").write_text(script)

    early = read_scd(spark, str(tmp_path), as_of="2024-06-01", schema=reader)
    got = {(r.id, r.status) for r in early.collect()}
    assert got == {(1, "hot"), (2, "new"), (3, "new"), (4, "new")}

    late = read_scd(spark, str(tmp_path), as_of="2025-06-01", schema=reader)
    got = {(r.id, r.status) for r in late.collect()}
    assert got == {(1, "hot"), (2, "new"), (3, "new")}  # id=4 deleted

    raw = read_scd(spark, str(tmp_path), as_of=-1, schema=reader)
    assert raw.count() == 4
