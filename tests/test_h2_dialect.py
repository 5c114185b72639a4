"""H2-dialect compat shim (SURVEY §7.4; reference evaluates DML
fragments with H2, SQLUpdater.java:77).  translate_h2 rewrites the
H2-isms that are NOT valid Spark SQL; everything else passes through
byte-identically."""

from __future__ import annotations

import pytest

from hive_scd_spark.scd import apply_statements
from hive_scd_spark.updates import ScdScriptError, parse_script, translate_h2


# -- pure string rewrites ----------------------------------------------------


def test_casewhen_to_if():
    assert translate_h2("CASEWHEN(a > 1, 'x', 'y')") == "if(a > 1, 'x', 'y')"


def test_casewhen_nested_and_case_insensitive():
    assert (
        translate_h2("CaseWhen(CASEWHEN(a=1,1,2) = 1, b, c)")
        == "if(if(a=1,1,2) = 1, b, c)"
    )


def test_casewhen_inside_string_literal_untouched():
    s = "name = 'CASEWHEN(not a call)'"
    assert translate_h2(s) == s


def test_quoted_identifier_untouched():
    s = '"casewhen" = 1'
    assert translate_h2(s) == s


def test_dateadd_quoted_unit():
    assert (
        translate_h2("DATEADD('DAY', 3, o_orderdate)")
        == "timestampadd(DAY, 3, o_orderdate)"
    )


def test_dateadd_bare_unit():
    assert translate_h2("dateadd(month, 1, d)") == "timestampadd(month, 1, d)"


def test_spark_two_arg_dateadd_untouched():
    # Spark's own dateadd(date, days) — first arg is not a unit
    s = "dateadd(o_orderdate, 3)"
    assert translate_h2(s) == s


def test_datediff_quoted_unit():
    assert (
        translate_h2("DATEDIFF('DAY', a, b) > 0") == "timestampdiff(DAY, a, b) > 0"
    )


def test_spark_two_arg_datediff_untouched():
    s = "datediff(end_d, start_d)"
    assert translate_h2(s) == s


def test_sysdate_keyword():
    assert translate_h2("o_orderdate < SYSDATE") == "o_orderdate < current_timestamp()"


def test_sysdate_as_function_call_untouched():
    # only the bare H2 keyword form is rewritten
    s = "sysdate(x)"
    assert translate_h2(s) == s


def test_curtime_rejected_loudly():
    with pytest.raises(ScdScriptError, match="CURTIME"):
        translate_h2("t > CURTIME()")
    with pytest.raises(ScdScriptError, match="CURRENT_TIME"):
        translate_h2("t > CURRENT_TIME")


def test_valid_spark_fragment_unchanged():
    s = "coalesce(nvl(a, b), ifnull(c, d)) || '-' || decode(e, 1, 'one', 'other')"
    assert translate_h2(s) == s


# -- through the parser ------------------------------------------------------


def test_parse_script_translates_set_and_where():
    stmts = parse_script(
        "UPDATE t SET a = CASEWHEN(b = 1, 2, 3) WHERE DATEADD('DAY', 1, d) > d2;"
    )
    assert stmts[0].sets == (("a", "if(b = 1, 2, 3)"),)
    assert stmts[0].where == "timestampadd(DAY, 1, d) > d2"


def test_parse_script_translates_delete_where():
    stmts = parse_script("DELETE FROM t WHERE CASEWHEN(x > 1, TRUE, FALSE);")
    assert stmts[0].where == "if(x > 1, TRUE, FALSE)"


# -- end to end through apply_statements -------------------------------------


def test_h2_script_end_to_end(spark):
    df = spark.createDataFrame(
        [(1, "1-URGENT", 10.0), (2, "5-LOW", 20.0), (3, "1-URGENT", 999.0)],
        "k int, pri string, price double",
    )
    script = (
        "UPDATE t SET pri = CASEWHEN(pri = '1-URGENT', 'TOP', pri) "
        "WHERE NVL(price, 0.0) < 100.0;\n"
        "DELETE FROM t WHERE CASEWHEN(price > 500.0, TRUE, FALSE);\n"
    )
    out = {r["k"]: r["pri"] for r in apply_statements(df, script).collect()}
    assert out == {1: "TOP", 2: "5-LOW"}


# -- reference-lexer negative-as-of pin (round-3 ADVICE item 3) --------------


def test_reference_lexer_negative_asof_skips_predirective_tail():
    """compat='reference', as_of<0 (raw mode): the reference inits
    currentScdTime=0 and `0 <= rootScdTime` is false, so pre-directive
    lines are never lexed — an incomplete tail is silently skipped, not
    'Incomplete SQL'.  At as_of>=0 the same tail IS lexed and raises."""
    from hive_scd_spark.updates import _scan_statements_reference

    incomplete = "UPDATE t SET x = 1\n"  # no terminating ';'
    assert _scan_statements_reference(incomplete, as_of_ms=-1) == []
    with pytest.raises(ScdScriptError, match="Incomplete"):
        _scan_statements_reference(incomplete, as_of_ms=0)
