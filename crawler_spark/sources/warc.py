"""WARC source + sink (ISO 28500 / WARC/1.0): the archival container a
production crawl at 100 TB actually reads and writes (Common Crawl's
format). The reference stores pages in Postgres rows only; this module is
engine-new surface, built from the public spec.

Layout: one WARC *segment* (file) holds a ``warcinfo`` record followed by
many ``response`` records; each record is::

    WARC/1.0\\r\\n
    <header-name>: <value>\\r\\n ...
    \\r\\n
    <Content-Length bytes of payload>
    \\r\\n\\r\\n

Parsing is driven strictly by ``Content-Length`` — the payload is NEVER
scanned for delimiters, so a payload that itself contains
``\\r\\n\\r\\nWARC/1.0`` cannot desynchronize the reader (unit-tested).

Scale shape: a segment is the unit of both write and read parallelism
(Common Crawl segments are ~1 GB). The sink groups documents into
bounded segments via one hash shuffle on the segment key; the source maps
segments to records with a narrow Arrow stage — no shuffle. Record IDs
are deterministic (urn:uuid from md5 of the target URI), so the sink is
idempotent and the roundtrip is oracle-checkable.
"""

from __future__ import annotations

import hashlib
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "warc_record_bytes",
    "warc_segment_bytes",
    "parse_warc_segment",
    "docs_to_warc_segments",
    "warc_segments_to_records",
    "warc_cdx",
    "docs_to_wet_segments",
    "wet_segments_to_records",
]

_CRLF = b"\r\n"
_HEADER_NAME_RE = re.compile(r"[A-Za-z0-9][A-Za-z0-9-]*")


def _record_id(uri: str) -> str:
    """Deterministic urn:uuid from the target URI (md5-derived), so
    re-writing the same corpus yields byte-identical segments."""
    h = hashlib.md5(uri.encode("utf-8")).hexdigest()
    return f"urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"


def warc_record_bytes(
    uri: str,
    payload: bytes,
    date: str,
    warc_type: str = "response",
    extra_headers: list[tuple[str, str]] | None = None,
    record_key: str | None = None,
) -> bytes:
    """One spec-shaped WARC/1.0 record. ``date`` is supplied by the
    caller (deterministic in tests/bench — no wall clock in executors).
    Header values must not contain CR/LF: a target URI with an embedded
    ``\\r\\n`` would inject headers or shift the Content-Length framing
    and desynchronize every record after it — the exact attack the
    length-driven parser exists to prevent, so the writer refuses it.
    ``record_key`` overrides the WARC-Record-ID derivation source (a
    conversion record for the same URI must not collide with its
    response record's id); ``extra_headers`` append after the target
    URI (e.g. WARC-Refers-To for WET conversion records)."""
    checks = [("uri", uri), ("date", date), ("warc_type", warc_type)]
    checks.extend(extra_headers or [])
    for name, val in checks:
        if "\r" in val or "\n" in val:
            raise ValueError(f"CR/LF in WARC header value {name}={val!r}")
    # header NAMES are as injectable as values: a name with an embedded
    # CRLF forges whole header lines, and one containing ': ' splits
    # early in the parser — restrict to the spec's token shape
    for name, _ in extra_headers or []:
        if not _HEADER_NAME_RE.fullmatch(name):
            raise ValueError(f"bad WARC header name {name!r}")
    headers = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode("ascii"),
        b"WARC-Record-ID: <" + _record_id(record_key or uri).encode("ascii") + b">",
        b"WARC-Date: " + date.encode("ascii"),
        b"WARC-Target-URI: " + uri.encode("utf-8"),
    ]
    headers.extend(
        k.encode("ascii") + b": " + v.encode("utf-8") for k, v in (extra_headers or [])
    )
    headers.extend(
        [
            b"Content-Type: text/plain",
            b"Content-Length: " + str(len(payload)).encode("ascii"),
        ]
    )
    return _CRLF.join(headers) + _CRLF + _CRLF + payload + _CRLF + _CRLF


def _warcinfo_record() -> bytes:
    """The shared segment-header record — one definition so WARC and WET
    segments can never drift in their warcinfo payload or date."""
    info_payload = b"software: crawler_spark\r\nformat: WARC File Format 1.0"
    return warc_record_bytes(
        "urn:crawler-spark:warcinfo", info_payload, "2026-01-01T00:00:00Z", "warcinfo"
    )


def warc_segment_bytes(records: list[tuple[str, bytes, str]]) -> bytes:
    """A full segment: warcinfo header record + response records.
    ``records``: [(uri, payload, date), ...] in the intended order."""
    out = [_warcinfo_record()]
    out.extend(warc_record_bytes(u, p, d) for u, p, d in records)
    return b"".join(out)


def parse_warc_segment(blob: bytes) -> list[dict]:
    """Parse one segment into records, driven by Content-Length only.
    Returns dicts with warc_type, target_uri, date, payload (bytes).
    Raises ValueError on framing violations (truncation, bad terminator,
    missing Content-Length) — a corrupt archive must fail loudly, not
    yield silently shifted payloads."""
    records = []
    pos = 0
    n = len(blob)
    while pos < n:
        head_end = blob.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            raise ValueError(f"unterminated record header at offset {pos}")
        head_lines = blob[pos:head_end].split(_CRLF)
        if head_lines[0] != b"WARC/1.0":
            raise ValueError(f"bad record magic at offset {pos}: {head_lines[0]!r}")
        headers = {}
        for line in head_lines[1:]:
            k, _, v = line.partition(b": ")
            headers[k.decode("ascii").lower()] = v.decode("utf-8")
        if "content-length" not in headers:
            raise ValueError(f"record at offset {pos} missing Content-Length")
        raw_len = headers["content-length"]
        # digits only: int() would accept '-4' (negative body_end makes the
        # terminator check read the header's OWN trailing \r\n\r\n, emitting
        # a phantom record and desynchronizing the reader), ' 5', '+5', '1_0'
        if not raw_len.isascii() or not raw_len.isdigit():
            raise ValueError(f"record at offset {pos} bad Content-Length {raw_len!r}")
        length = int(raw_len)
        body_start = head_end + 4
        body_end = body_start + length
        if blob[body_end : body_end + 4] != _CRLF + _CRLF:
            raise ValueError(f"record at offset {pos} not \\r\\n\\r\\n-terminated")
        records.append(
            {
                "warc_type": headers.get("warc-type", ""),
                "target_uri": headers.get("warc-target-uri", ""),
                "date": headers.get("warc-date", ""),
                "refers_to": headers.get("warc-refers-to", "").strip("<>"),
                "payload": blob[body_start:body_end],
                "offset": pos,  # record start — the CDX random-access key
                "length": body_end + 4 - pos,
            }
        )
        pos = body_end + 4
    return records


_SEGMENT_SCHEMA = "segment_id long, n_records int, segment binary"
_RECORD_SCHEMA = "segment_id long, target_uri string, content_length int, payload_md5 string"


def docs_to_warc_segments(docs: DataFrame, docs_per_segment: int = 100) -> DataFrame:
    """WARC sink stage: (doc_id, text) -> (segment_id, n_records, segment
    bytes). One hash shuffle on the segment key; segment bytes are built
    in doc_id order inside each group so output is deterministic. The
    WARC date is derived from doc_id (no executor wall clock)."""

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        recs = [
            (
                f"https://corpus.example.org/doc/{int(doc_id)}",
                text.encode("utf-8"),
                f"2026-01-01T00:00:{int(doc_id) % 60:02d}Z",
            )
            for doc_id, text in zip(pdf["doc_id"], pdf["text"])
        ]
        seg = warc_segment_bytes(recs)
        return pd.DataFrame(
            {
                "segment_id": [int(pdf["segment_id"].iloc[0])],
                "n_records": pd.Series([len(recs)], dtype="int32"),
                "segment": [seg],
            }
        )

    with_key = docs.select(
        "doc_id",
        "text",
        # integer DIV, not float-divide-then-cast: cast('long') on a double
        # truncates toward zero (wrong segment for negative ids) and loses
        # exactness past 2^53
        F.expr(f"doc_id DIV {int(docs_per_segment)}").alias("segment_id"),
    )
    return with_key.groupBy("segment_id").applyInPandas(_build, _SEGMENT_SCHEMA)


def _iter_response_records(pdf: pd.DataFrame):
    """Shared segment-walk for the record and CDX mappers: yields
    (segment_id, record-dict) for every RESPONSE record in the batch
    (warcinfo records consumed and skipped). One implementation so the
    response filter and bytes() coercion can never drift between the
    two read paths."""
    for seg_id, blob in zip(pdf["segment_id"], pdf["segment"]):
        for rec in parse_warc_segment(bytes(blob)):
            if rec["warc_type"] == "response":
                yield int(seg_id), rec


def warc_segments_to_records(segments: DataFrame) -> DataFrame:
    """WARC source stage: segments -> flat response-record rows (narrow,
    no shuffle; one task per partition of segments). warcinfo records are
    consumed and skipped, response payloads are digested."""

    def _parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"segment_id": [], "target_uri": [], "content_length": [], "payload_md5": []}
            for seg_id, rec in _iter_response_records(pdf):
                out["segment_id"].append(seg_id)
                out["target_uri"].append(rec["target_uri"])
                out["content_length"].append(len(rec["payload"]))
                out["payload_md5"].append(hashlib.md5(rec["payload"]).hexdigest())
            yield pd.DataFrame(
                {
                    "segment_id": pd.Series(out["segment_id"], dtype="int64"),
                    "target_uri": pd.Series(out["target_uri"], dtype="object"),
                    "content_length": pd.Series(out["content_length"], dtype="int32"),
                    "payload_md5": pd.Series(out["payload_md5"], dtype="object"),
                }
            )

    return segments.mapInPandas(_parse, _RECORD_SCHEMA)


_CDX_SCHEMA = "segment_id long, target_uri string, offset long, length int"


def warc_cdx(segments: DataFrame) -> DataFrame:
    """CDX-style capture index over WARC segments: one (segment, uri,
    byte offset, record length) row per response record — the structure
    that makes a 100 TB archive randomly accessible (seek to ``offset``,
    read ``length`` bytes, parse one record; pytest proves exactly that
    slice-fetch). Offsets come from the PARSER's position tracking; the
    driver oracle re-derives them independently from record-length
    arithmetic, so writer framing and parser accounting cross-check."""

    def _index(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"segment_id": [], "target_uri": [], "offset": [], "length": []}
            for seg_id, rec in _iter_response_records(pdf):
                out["segment_id"].append(seg_id)
                out["target_uri"].append(rec["target_uri"])
                out["offset"].append(rec["offset"])
                out["length"].append(rec["length"])
            yield pd.DataFrame(
                {
                    "segment_id": pd.Series(out["segment_id"], dtype="int64"),
                    "target_uri": pd.Series(out["target_uri"], dtype="object"),
                    "offset": pd.Series(out["offset"], dtype="int64"),
                    "length": pd.Series(out["length"], dtype="int32"),
                }
            )

    return segments.mapInPandas(_index, _CDX_SCHEMA)

_WET_RECORD_SCHEMA = (
    "segment_id long, target_uri string, refers_to string, "
    "content_length int, payload_md5 string"
)


def docs_to_wet_segments(docs: DataFrame, docs_per_segment: int = 100) -> DataFrame:
    """WET sink stage (the Common Crawl text-extraction sidecar): the
    same segment framing as docs_to_warc_segments, but records are
    ``WARC-Type: conversion`` whose payload is the EXTRACTED text and
    whose ``WARC-Refers-To`` header points at the response record the
    text was derived from (id = the same deterministic urn the response
    writer assigns that URI, so a WET record can be joined back to its
    WARC capture without parsing the archive). The conversion record's
    own id derives from "conversion:" + uri — same URI, distinct id.

    Scale shape: identical to the WARC sink — one hash shuffle on the
    segment key, bytes built in doc_id order inside each group."""

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        recs = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            uri = f"https://corpus.example.org/doc/{int(doc_id)}"
            recs.append(
                warc_record_bytes(
                    uri,
                    text.encode("utf-8"),
                    f"2026-01-01T00:00:{int(doc_id) % 60:02d}Z",
                    warc_type="conversion",
                    extra_headers=[("WARC-Refers-To", f"<{_record_id(uri)}>")],
                    record_key=f"conversion:{uri}",
                )
            )
        seg = _warcinfo_record() + b"".join(recs)
        return pd.DataFrame(
            {
                "segment_id": [int(pdf["segment_id"].iloc[0])],
                "n_records": pd.Series([len(recs)], dtype="int32"),
                "segment": [seg],
            }
        )

    with_key = docs.select(
        "doc_id",
        "text",
        F.expr(f"doc_id DIV {int(docs_per_segment)}").alias("segment_id"),
    )
    return with_key.groupBy("segment_id").applyInPandas(_build, _SEGMENT_SCHEMA)


def wet_segments_to_records(segments: DataFrame) -> DataFrame:
    """WET source stage: segments -> flat conversion-record rows with
    the refers-to link (narrow, no shuffle)."""

    def _parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "segment_id": [],
                "target_uri": [],
                "refers_to": [],
                "content_length": [],
                "payload_md5": [],
            }
            for seg_id, blob in zip(pdf["segment_id"], pdf["segment"]):
                for rec in parse_warc_segment(bytes(blob)):
                    if rec["warc_type"] != "conversion":
                        continue
                    out["segment_id"].append(int(seg_id))
                    out["target_uri"].append(rec["target_uri"])
                    out["refers_to"].append(rec["refers_to"])
                    out["content_length"].append(len(rec["payload"]))
                    out["payload_md5"].append(hashlib.md5(rec["payload"]).hexdigest())
            yield pd.DataFrame(
                {
                    "segment_id": pd.Series(out["segment_id"], dtype="int64"),
                    "target_uri": pd.Series(out["target_uri"], dtype="object"),
                    "refers_to": pd.Series(out["refers_to"], dtype="object"),
                    "content_length": pd.Series(out["content_length"], dtype="int32"),
                    "payload_md5": pd.Series(out["payload_md5"], dtype="object"),
                }
            )

    return segments.mapInPandas(_parse, _WET_RECORD_SCHEMA)
