"""Cross-engine regex contract hardening: run the regex-based text
operators (clean_text, redact_pii, strip_html) through BOTH engines —
Spark (Java regex) and DuckDB (RE2) — over a deliberately nasty corpus
(vertical tab, unicode, boundary digits, double-escaped entities,
IP-shaped mail domains) and require byte-identical outputs.

The per-query oracle harness already value-checks these over the
synthetic corpus; this test exists because the synthetic corpus is
polite — the divergence classes the operators claim to have engineered
away (\\s vs \\x0B, lookahead-free patterns, leftmost-first
alternation) only show up on hostile inputs."""

from __future__ import annotations

import duckdb
import pandas as pd

NASTY = [
    (0, ""),
    (1, " \t\n\x0b\f\r mixed \x0b whitespace \x0b\x0b runs  "),
    (2, "plain ascii text with no surprises"),
    (3, "Юникод текст с https://пример.example/path и почтой a@b.example.org"),
    (4, "email edge a.b-c_d%e+f@sub.domain-x.example.co"),
    (5, "not-an-email a@@b.com trailing@ @leading a@b"),
    (6, "ip-domain mail root@10.0.0.1 and bare 192.168.1.255 and big 1234.1.1.1"),
    (7, "phones +1 555-0134 221 and (415) 555-2671 but not +1x555 or 555 0134"),
    (8, "urls https://a.example/x?q=1&r=2#frag http://b.example and httpx://no"),
    (9, "<div class=\"a\">tags <b>bold</b> &amp;lt; double &quot;q&quot;</div>"),
    (10, "unclosed <tag and dangling > bracket plus <> empty"),
    (11, "999.999.999.999 and 0.0.0.0 and 1.2.3.4.5 chains"),
    (12, "url then space https://x.example\x0bvtab-terminated"),
]

WS = "[ \\t\\n\\x0B\\f\\r]"
NON_WS = "[^ \\t\\n\\x0B\\f\\r]"
URL = f"https?://{NON_WS}+"
EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
PHONE = "\\+[0-9]{1,3}([- ][0-9]{2,4}){2,4}|\\([0-9]{3}\\) [0-9]{3}-[0-9]{4}"
IPV4 = "\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b"
TAG = "<[^>]+>"


def _duck(rows):
    con = duckdb.connect()
    con.register("nasty", pd.DataFrame(rows, columns=["id", "s"]))
    return con


def test_clean_text_byte_identical(spark):
    from hive_scd_spark.operators.text import clean_text

    df = spark.createDataFrame(NASTY, "id long, s string")
    got = {
        r.id: (r.clean_text, r.had_url, r.had_email)
        for r in clean_text(df, "id", "s").collect()
    }
    con = _duck(NASTY)
    want = {
        i: (c, u, e)
        for i, c, u, e in con.execute(f"""
            WITH s1 AS (SELECT id, s, regexp_replace(s, '{URL}', ' ', 'g') AS nu FROM nasty),
            s2 AS (SELECT id, s, nu, regexp_replace(nu, '{EMAIL}', ' ', 'g') AS ne FROM s1)
            SELECT id, trim(regexp_replace(ne, '{WS}+', ' ', 'g')),
                   CAST(len(s) <> len(nu) AS INT), CAST(len(nu) <> len(ne) AS INT)
            FROM s2
        """).fetchall()
    }
    assert got == want


def test_redact_pii_byte_identical(spark):
    from hive_scd_spark.operators.text import redact_pii

    df = spark.createDataFrame(NASTY, "id long, s string")
    got = {
        r.id: (r.redacted_text, r.n_emails, r.n_phones, r.n_ips)
        for r in redact_pii(df, "id", "s").collect()
    }
    con = _duck(NASTY)
    want = {
        i: (t, a, b, c)
        for i, t, a, b, c in con.execute(f"""
            WITH s1 AS (SELECT id, s, regexp_replace(s, '{EMAIL}', '<EMAIL>', 'g') AS ne FROM nasty),
            s2 AS (SELECT id, s, ne, regexp_replace(ne, '{PHONE}', '<PHONE>', 'g') AS np FROM s1)
            SELECT id, regexp_replace(np, '{IPV4}', '<IP>', 'g'),
                   CAST(len(regexp_extract_all(s, '{EMAIL}')) AS BIGINT),
                   CAST(len(regexp_extract_all(ne, '{PHONE}')) AS BIGINT),
                   CAST(len(regexp_extract_all(np, '{IPV4}')) AS BIGINT)
            FROM s2
        """).fetchall()
    }
    assert got == want


def test_strip_html_byte_identical(spark):
    from hive_scd_spark.operators.text import strip_html

    df = spark.createDataFrame(NASTY, "id long, s string")
    got = {
        r.id: (r.stripped_text, r.n_tags) for r in strip_html(df, "id", "s").collect()
    }
    con = _duck(NASTY)
    want = {
        i: (t, n)
        for i, t, n in con.execute(f"""
            WITH s1 AS (SELECT id, s, regexp_replace(s, '{TAG}', ' ', 'g') AS nt FROM nasty),
            s2 AS (SELECT id, s,
                     replace(replace(replace(replace(replace(replace(nt,
                       '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
                       '&nbsp;', ' '), '&amp;', '&') AS dec
                   FROM s1)
            SELECT id, trim(regexp_replace(dec, '{WS}+', ' ', 'g')),
                   CAST(len(regexp_extract_all(s, '{TAG}')) AS BIGINT)
            FROM s2
        """).fetchall()
    }
    assert got == want
