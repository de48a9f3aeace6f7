"""WARC container framing tests (sources/warc.py, ISO 28500 shape):
Content-Length-driven parsing must survive payloads that CONTAIN the
record delimiter / magic, and must fail loudly on corrupt framing."""

import pytest

from crawler_spark.sources.warc import (
    parse_warc_segment,
    warc_record_bytes,
    warc_segment_bytes,
)

DATE = "2026-01-01T00:00:00Z"


def _roundtrip(payloads):
    recs = [
        (f"https://h.org/{i}", p, DATE) for i, p in enumerate(payloads)
    ]
    parsed = parse_warc_segment(warc_segment_bytes(recs))
    assert parsed[0]["warc_type"] == "warcinfo"
    got = [r["payload"] for r in parsed if r["warc_type"] == "response"]
    assert got == list(payloads)
    return parsed


def test_roundtrip_simple_and_empty():
    _roundtrip([b"hello world", b"", b"x" * 10_000])


def test_payload_containing_record_delimiter_and_magic():
    """The killer case for delimiter-scanning parsers: a payload that
    embeds the inter-record terminator followed by a fake record head.
    Content-Length framing must return it byte-exact and keep parsing
    the REAL next record."""
    evil = b"before\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\nafter"
    _roundtrip([evil, b"next-real-record"])


def test_unicode_payload_lengths_are_bytes():
    text = "café — señor \U0001f680"
    payload = text.encode("utf-8")
    parsed = _roundtrip([payload])
    resp = [r for r in parsed if r["warc_type"] == "response"][0]
    assert len(resp["payload"]) == len(payload) != len(text)


def test_truncated_segment_raises():
    blob = warc_segment_bytes([("https://h.org/1", b"abcdef", DATE)])
    with pytest.raises(ValueError):
        parse_warc_segment(blob[:-3])  # chops the final terminator


def test_corrupt_magic_raises():
    blob = warc_segment_bytes([("https://h.org/1", b"abcdef", DATE)])
    with pytest.raises(ValueError):
        parse_warc_segment(b"XXXX" + blob[4:])


def test_segments_deterministic():
    recs = [(f"https://h.org/{i}", f"doc {i}".encode(), DATE) for i in range(5)]
    assert warc_segment_bytes(recs) == warc_segment_bytes(recs)
    one = warc_record_bytes("https://h.org/1", b"p", DATE)
    assert one == warc_record_bytes("https://h.org/1", b"p", DATE)


def test_roundtrip_fuzz_binary_payloads():
    """Property: ANY byte payloads (including ones full of CR/LF runs and
    WARC magic fragments) roundtrip byte-exact through a segment."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.binary(max_size=400), min_size=0, max_size=6))
    def run(payloads):
        _roundtrip(payloads)

    run()


def test_cdx_offsets_enable_slice_fetch():
    """The CDX contract: seek to offset, read length bytes, parse exactly
    that record — against a multi-record segment with varied payloads."""
    payloads = [b"", b"short", b"x" * 3000, "unicode café \U0001f680".encode()]
    recs = [(f"https://h.org/{i}", p, DATE) for i, p in enumerate(payloads)]
    blob = warc_segment_bytes(recs)
    for rec in parse_warc_segment(blob):
        if rec["warc_type"] != "response":
            continue
        window = blob[rec["offset"] : rec["offset"] + rec["length"]]
        (single,) = parse_warc_segment(window)
        assert single["target_uri"] == rec["target_uri"]
        assert single["payload"] == rec["payload"]


def test_negative_or_garbage_content_length_raises():
    """int() would accept '-4' (phantom record: body_end lands back on
    the header's own terminator and the real payload is re-parsed as
    records), ' 5', '+5', '1_0' — the parser must reject all of them."""
    import pytest

    from crawler_spark.sources.warc import parse_warc_segment, warc_record_bytes

    good = warc_record_bytes("https://h.org/x", b"abcd", "2026-01-01T00:00:00Z")
    for bad in (b"-4", b" 4", b"+4", b"1_0", b"0x4", b""):
        corrupt = good.replace(b"Content-Length: 4", b"Content-Length: " + bad)
        with pytest.raises(ValueError, match="Content-Length"):
            parse_warc_segment(corrupt)
    # and the embedded-payload attack shape end-to-end: a forged record
    # whose negative length points the parser back into its own header
    inner = warc_record_bytes("https://evil.org/fake", b"owned", "2026-01-01T00:00:00Z")
    outer = good.replace(b"Content-Length: 4", b"Content-Length: -4").replace(
        b"abcd", inner
    )
    with pytest.raises(ValueError):
        parse_warc_segment(outer)


def test_crlf_in_header_values_refused():
    import pytest

    from crawler_spark.sources.warc import warc_record_bytes

    with pytest.raises(ValueError, match="CR/LF"):
        warc_record_bytes(
            "https://h.org/\r\nContent-Length: 0\r\n\r\n", b"x", "2026-01-01T00:00:00Z"
        )
    with pytest.raises(ValueError, match="CR/LF"):
        warc_record_bytes("https://h.org/x", b"x", "2026-01-01\n")


def test_writer_refuses_header_name_injection():
    """A crafted extra-header NAME with embedded CRLF (or ': ') would
    forge whole header lines / split early in the parser — the writer
    must refuse names outside the spec token shape."""
    import pytest

    from crawler_spark.sources.warc import warc_record_bytes

    for bad in (
        "X-Evil\r\nWARC-Target-URI",
        "X-Evil: sneaky",
        "X Evil",
        "",
        "-leading-dash",
    ):
        with pytest.raises(ValueError):
            warc_record_bytes(
                "https://a.example.org/",
                b"p",
                "2026-01-01T00:00:00Z",
                extra_headers=[(bad, "v")],
            )
    # a legitimate name still passes
    rec = warc_record_bytes(
        "https://a.example.org/",
        b"p",
        "2026-01-01T00:00:00Z",
        extra_headers=[("WARC-Refers-To", "<urn:uuid:x>")],
    )
    assert b"WARC-Refers-To: <urn:uuid:x>\r\n" in rec
