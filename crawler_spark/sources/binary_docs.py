"""Binary document source (SURVEY.md S2): PDFs land as binary files and
are parsed into interleaved-span rows with Spark's ``binaryFile`` source +
the engine's Arrow span parser.

Reference semantics: one text unit per PDF page, pages joined in page
order (/root/reference/backend/scraping/pdf_scraper.py:21-24). The fixture
PDF encoding is page texts joined by form-feed (FIXTURES.md §1); a
production deployment swaps ``parse_pdf_payload`` for a pypdf-backed one
with the same signature — the Spark plumbing does not change.

Scale shape: ``binaryFile`` splits by file; column pruning keeps ``content``
out of the scan when only paths/lengths are selected. Files >
``maxPartitionBytes`` are single-partition by design (one PDF = one parse
unit); partition count follows file count, so a 10^8-file corpus reads
with normal task parallelism.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.linkextract import build_spans_pdf

__all__ = ["read_binary_docs", "parse_pdf_payload"]

_SPANS_SCHEMA = (
    "doc_id string, n_pages int, "
    "spans array<struct<kind string, text string, media_ref string, offset int>>"
)


def parse_pdf_payload(payload: bytes) -> list:
    """Decode the fixture PDF encoding into spans (page order preserved)."""
    text = payload.decode("utf-8", "ignore")
    return [
        {"kind": s.kind, "text": s.text, "media_ref": s.media_ref, "offset": s.offset}
        for s in build_spans_pdf(text)
    ]


def read_binary_docs(spark: SparkSession, path: str, glob: str = "*.pdf") -> DataFrame:
    """spark.read.format('binaryFile') -> Arrow-parsed span rows.
    doc_id = file name stem (the fetch tier records the source URL in a
    sidecar mapping at production scale)."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def _parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"doc_id": [], "n_pages": [], "spans": []}
            for p, content in zip(pdf["path"], pdf["content"]):
                spans = parse_pdf_payload(content if content is not None else b"")
                rows["doc_id"].append(p.rsplit("/", 1)[-1])
                rows["n_pages"].append(len(spans))
                rows["spans"].append(spans)
            yield pd.DataFrame(rows)

    return raw.mapInPandas(_parse, _SPANS_SCHEMA)
