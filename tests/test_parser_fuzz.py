"""Grammar-based fuzz of the .updates lexer/parser: random statements
rendered with hostile formatting (comments, multi-line splits, quoted
literals containing `--` and `;`) must survive parsing intact."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

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
