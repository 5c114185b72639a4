"""Property tests for the round-9 surface: WARC framing roundtrip
under adversarial payloads (hypothesis, pure Python — no Spark in the
loop) and URL-canonicalizer idempotence / variant-collapse (one
batched Spark job over a seeded generator corpus)."""

from __future__ import annotations

import random
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from hive_scd_spark.sources.warc import parse_warc_bytes, write_warc_records

# header-safe text: no CR/LF (the writer does not escape header values)
_hdr_text = st.text(
    alphabet=string.ascii_letters + string.digits + ":/.-_<>@ ", min_size=0, max_size=40
)

# payloads deliberately include WARC magic and terminator fragments
_payload = st.one_of(
    st.binary(min_size=0, max_size=200),
    st.sampled_from(
        [
            b"WARC/1.0\r\n",
            b"\r\n\r\nWARC/1.0\r\nContent-Length: 3\r\n\r\nxyz\r\n\r\n",
            b"\r\n\r\n" * 10,
            b"Content-Length: 999\r\n",
        ]
    ),
    st.tuples(st.binary(max_size=50), st.binary(max_size=50)).map(
        lambda t: t[0] + b"\r\n\r\nWARC/1.1\r\n" + t[1]
    ),
)

_record = st.fixed_dictionaries(
    {
        "record_id": _hdr_text.map(lambda s: f"<urn:x:{s}>"),
        "warc_type": st.sampled_from(["resource", "metadata", "request"]),
        "target_uri": st.none() | _hdr_text,
        "warc_date": st.none() | st.just("2024-01-01T00:00:00Z"),
        "content_type": st.none() | st.just("application/octet-stream"),
        "payload": _payload,
    }
)


@given(st.lists(_record, min_size=0, max_size=8), st.booleans())
@settings(max_examples=60, deadline=None)
def test_warc_roundtrip_adversarial_payloads(records, compress):
    """write → parse is the identity on (id, type, uri, payload), for
    ANY payload bytes — including payloads embedding WARC magic and
    record terminators (Content-Length framing must never resynchronize
    on content)."""
    import gzip

    data = write_warc_records(records, compress=compress)
    out = parse_warc_bytes(
        gzip.decompress(data) if compress and records else data
    )
    assert len(out) == len(records)
    for want, got in zip(records, out):
        assert got["record_id"] == want["record_id"].strip()
        assert got["warc_type"] == want["warc_type"]
        # header VALUES are whitespace-trimmed on parse (WARC field
        # semantics) — roundtrip holds modulo strip
        want_uri = want["target_uri"]
        assert got["target_uri"] == (
            want_uri.strip() if want_uri is not None else None
        )
        assert got["payload"] == want["payload"]
        assert got["content_length"] == len(want["payload"])


def _url_corpus(n=300, seed=9):
    """Seeded generator corpus: for each logical page, several surface
    variants that MUST collapse to one canonical form, plus garbage
    strings that must pass through trimmed-but-unmangled."""
    rng = random.Random(seed)
    groups, garbage = [], []
    for i in range(n):
        host = f"site{i}.example{rng.randint(0, 9)}.com"
        path = "/" + "/".join(
            rng.choice(["docs", "a", "B", "x1"]) for _ in range(rng.randint(0, 3))
        )
        if path == "/":
            path = ""
        params = [f"k{j}={rng.randint(0, 99)}" for j in range(rng.randint(0, 3))]
        scheme = rng.choice(["http", "https"])
        canonical_query = "?" + "&".join(sorted(params)) if params else ""
        canonical = f"{scheme}://{host}{path}{canonical_query}"
        variants = [canonical]
        # case-shuffled scheme+host
        variants.append(
            f"{scheme.upper()}://{host.upper()}{path}{canonical_query}"
        )
        # www. + trailing slash
        variants.append(
            f"{scheme}://www.{host}{path}/" + canonical_query
            if not canonical_query
            else f"{scheme}://www.{host}{path}/{canonical_query}"
        )
        # default port + tracking params + shuffled order + fragment
        port = ":443" if scheme == "https" else ":80"
        q = list(params) + ["utm_campaign=z", "fbclid=abc"]
        rng.shuffle(q)
        variants.append(f"{scheme}://{host}{port}{path}?" + "&".join(q) + "#frag")
        groups.append((canonical, variants))
    for i in range(60):
        garbage.append(
            "  "
            + "".join(rng.choice(string.printable.strip() + " ") for _ in range(rng.randint(0, 30)))
        )
    # keep garbage free of URL prefixes so passthrough is well-defined
    garbage = [g for g in garbage if "://" not in g]
    return groups, garbage


def test_canonicalize_url_variant_collapse_and_idempotence(spark):
    from pyspark.sql import functions as F

    from hive_scd_spark.operators.text import canonicalize_url

    groups, garbage = _url_corpus()
    rows = []
    for gi, (canonical, variants) in enumerate(groups):
        rows += [(gi, v) for v in variants]
    rows += [(-1 - i, g) for i, g in enumerate(garbage)]
    df = spark.createDataFrame(rows, "gid long, u string")
    out = df.select(
        "gid",
        "u",
        canonicalize_url("u").alias("c1"),
        canonicalize_url(canonicalize_url("u")).alias("c2"),
    ).collect()
    by_gid: dict[int, set] = {}
    for r in out:
        # idempotence holds for EVERY input, URLs and garbage alike
        assert r.c1 == r.c2, (r.u, r.c1, r.c2)
        if r.gid >= 0:
            by_gid.setdefault(r.gid, set()).add(r.c1)
        else:
            assert r.c1 == r.u.strip(), (r.u, r.c1)
    for gi, (canonical, _) in enumerate(groups):
        assert by_gid[gi] == {canonical}, (gi, by_gid[gi], canonical)
