"""Grammar-based fuzz of the .updates lexer/parser: random statements
rendered with hostile formatting (comments, multi-line splits, quoted
literals containing `--` and `;`) must survive parsing intact."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

import pytest

from hive_scd_spark.updates import parse_script

ident = st.sampled_from(["a", "b", "col_x", "Val1"])
literal = st.one_of(
    st.integers(-999, 999).map(str),
    st.sampled_from(["'plain'", "'has -- dashes'", "'semi;colon'", "'it''s'", "NULL"]),
)
cmp_op = st.sampled_from(["=", "<", ">", "<=", ">=", "<>"])


@st.composite
def where_clause(draw):
    parts = [
        f"{draw(ident)} {draw(cmp_op)} {draw(literal)}"
        for _ in range(draw(st.integers(1, 3)))
    ]
    return " AND ".join(parts)


@st.composite
def statement(draw):
    table = draw(st.sampled_from(["t", "T", "my_table"]))
    where = draw(st.none() | where_clause())
    if draw(st.booleans()):
        sets = [
            (draw(ident), draw(literal)) for _ in range(draw(st.integers(1, 3)))
        ]
        sql = f"UPDATE {table} SET " + ", ".join(f"{c} = {v}" for c, v in sets)
        kind = "update"
    else:
        sets = []
        sql = f"DELETE FROM {table}"
        kind = "delete"
    if where:
        sql += f" WHERE {where}"
    return {"sql": sql, "kind": kind, "n_sets": len(sets), "where": where}


@st.composite
def script(draw):
    stmts = draw(st.lists(statement(), max_size=5))
    lines = []
    expected = []
    for s in stmts:
        if draw(st.booleans()):
            lines.append(f"-- time={draw(st.integers(0, 10**12))}")
        if draw(st.booleans()):
            lines.append("-- a comment line")
        text = s["sql"]
        if draw(st.booleans()):  # split across lines at spaces
            words = text.split(" ")
            cut = draw(st.integers(1, max(len(words) - 1, 1)))
            lines.append(" ".join(words[:cut]))
            text = " ".join(words[cut:])
        suffix = " -- trailing" if draw(st.booleans()) else ""
        lines.append(text + ";" + suffix)
        expected.append(s)
    return "\n".join(lines) + "\n", expected


@settings(max_examples=200, deadline=None)
@given(data=script())
def test_fuzz_roundtrip(data):
    text, expected = data
    # mixed table names legitimately error; single-table scripts must parse
    tables = {e["sql"].split()[1 if e["kind"] == "update" else 2].upper() for e in expected}
    if len(tables) > 1:
        return
    parsed = parse_script(text)
    assert len(parsed) == len(expected)
    for got, want in zip(parsed, expected):
        assert got.kind == want["kind"]
        assert len(got.sets) == want["n_sets"]
        if want["where"] is None:
            assert got.where is None
        else:
            # quoted content must survive verbatim (incl. -- and ;)
            assert got.where.replace(" ", "") == want["where"].replace(" ", "")


@settings(max_examples=200, deadline=None)
@given(data=script())
def test_fuzz_compat_reference_agrees_on_quote_free_scripts(data):
    """On scripts whose literals contain no `--`/`;` (and whose time
    directives use the raw prefix, as the generator emits), the
    quote-aware and reference-exact lexers must produce identical
    statement lists — the compat mode only diverges on the documented
    quoting edge cases."""
    text, expected = data
    if "dashes" in text or "semi;colon" in text:
        return  # documented divergence: `--`/`;` inside literals
    if "-- trailing" in text:
        # faithful reference quirk: Java comment-strips the TRIMMED line
        # but never re-trims, so `...; -- c` leaves a trailing space and
        # endsWith(";") fails → statement treated as incomplete
        # (SQLUpdater.java:133-139); pinned in
        # test_compat_reference_trailing_comment_breaks_terminator
        return
    tables = {e["sql"].split()[1 if e["kind"] == "update" else 2].upper() for e in expected}
    if len(tables) > 1:
        return
    assert parse_script(text) == parse_script(text, compat="reference")


# -- H2 function-corpus fuzz (round 6) ---------------------------------------
# Every fragment the grammar below generates is legal H2; translate_h2
# must either emit a fragment Spark can ANALYZE or raise ScdScriptError
# loudly — never leak an unparseable/ambiguous rewrite.

_str_expr = st.sampled_from(["a", "b", "'lit''x'", "NULL"])
_int_expr = st.sampled_from(["1", "3", "0"])
_pat_lit = st.sampled_from(["'a.c'", "'^x'", "'[0-9]+'"])
_good_flags = st.sampled_from(["'i'", "'c'", "'m'", "'n'", "'im'", "'in'", "''"])


@st.composite
def h2_fragment(draw):
    kind = draw(
        st.sampled_from(
            ["concat", "instr2", "instr3", "locate", "ifnull", "nvl",
             "regexp2", "regexp3", "casewhen", "nested",
             "bitand", "bitor", "bitxor", "lshift", "rshift",
             "day_of_week", "iso_dow", "curdate", "strinsert"]
        )
    )
    e1, e2 = draw(_str_expr), draw(_str_expr)
    i1 = draw(_int_expr)
    p = draw(_pat_lit)
    if kind == "concat":
        return f"CONCAT({e1}, {e2})"
    if kind == "instr2":
        return f"INSTR({e1}, {e2})"
    if kind == "instr3":
        return f"INSTR({e1}, {e2}, {i1})"
    if kind == "locate":
        return f"LOCATE({e2}, {e1}, {i1})"
    if kind == "ifnull":
        return f"IFNULL({e1}, {e2})"
    if kind == "nvl":
        return f"NVL({e1}, {e2})"
    if kind == "regexp2":
        return f"REGEXP_LIKE({e1}, {p})"
    if kind == "regexp3":
        return f"REGEXP_LIKE({e1}, {p}, {draw(_good_flags)})"
    if kind == "casewhen":
        return f"CASEWHEN({e1} = {e2}, {e1}, {e2})"
    if kind in ("bitand", "bitor", "bitxor"):
        return f"{kind.upper()}({i1}, 5)"
    if kind in ("lshift", "rshift"):
        return f"{kind.upper()}({i1}, 2)"
    if kind == "day_of_week":
        return "DAY_OF_WEEK(DATE '2024-03-15')"
    if kind == "iso_dow":
        return "ISO_DAY_OF_WEEK(DATE '2024-03-15')"
    if kind == "curdate":
        return draw(st.sampled_from(["CURDATE", "CURDATE()"]))
    if kind == "strinsert":
        return f"INSERT({e1}, {i1}, 2, {e2})"
    # one level of nesting: H2 construct inside an H2 construct
    return f"CONCAT(CASEWHEN({e1} = {e2}, {e1}, 'n'), INSTR({e1}, {e2}, {i1}))"


@settings(max_examples=60, deadline=None)
@given(frag=h2_fragment())
def test_fuzz_h2_corpus_translates_to_analyzable_spark(frag, spark):
    from hive_scd_spark.updates import ScdScriptError, translate_h2

    try:
        out = translate_h2(frag)
    except ScdScriptError:
        return  # loud rejection is a valid outcome
    # Spark must parse AND analyze the rewrite (schema access resolves
    # the plan driver-side; no job runs)
    spark.sql(f"SELECT {out} AS r FROM VALUES ('x', 'y') AS t(a, b)").schema


@settings(max_examples=40, deadline=None)
@given(
    flag=st.sampled_from(["'x'", "'iz'", "'q'"]),
    pat=_pat_lit,
)
def test_fuzz_h2_bad_regexp_flags_always_loud(flag, pat):
    from hive_scd_spark.updates import ScdScriptError, translate_h2

    with pytest.raises(ScdScriptError):
        translate_h2(f"REGEXP_LIKE(a, {pat}, {flag})")
