"""Generate the judge-facing golden files (SURVEY.md §5.4) from the
pure-Python oracle at seed=42. Commit the output under tests/golden/.

    python tools/make_golden.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.fixtures import make_web_graph
from crawler_spark.oracle import crawl_many, make_policy

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden")

FIXTURE = dict(n_hosts=3, pages_per_host=14, seed=42, max_pages=5)
POLICY = "lexmin"


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    g = make_web_graph(**FIXTURE)
    out = crawl_many(g.seeds, g.web, make_policy(POLICY))

    with open(os.path.join(GOLDEN_DIR, "crawl_order.jsonl"), "w") as f:
        for sc in out:
            for rec in sc.records:
                f.write(json.dumps({
                    "source_url": sc.source_url, "host": rec.host,
                    "seq": rec.seq, "url": rec.url, "ok": rec.ok,
                }) + "\n")

    with open(os.path.join(GOLDEN_DIR, "url_seen.jsonl"), "w") as f:
        for sc in out:
            for url in sorted(sc.processed):
                f.write(json.dumps({"source_url": sc.source_url, "url": url}) + "\n")

    with open(os.path.join(GOLDEN_DIR, "spans.jsonl"), "w") as f:
        for sc in out:
            for rec in sc.records:
                if rec.ok:
                    f.write(json.dumps({
                        "source_url": sc.source_url, "seq": rec.seq, "doc_id": rec.url,
                        "spans": [
                            {"kind": s.kind, "text": s.text, "media_ref": s.media_ref, "offset": s.offset}
                            for s in rec.spans
                        ],
                    }) + "\n")

    with open(os.path.join(GOLDEN_DIR, "crawl_counters.json"), "w") as f:
        json.dump(
            {
                sc.source_url: {
                    "pages_crawled": sc.pages_crawled,
                    "total_pages_found": sc.total_pages_found,
                    "max_pages_limit": sc.max_pages,
                }
                for sc in out
            },
            f,
            indent=1,
        )
    print(f"golden files written to {GOLDEN_DIR}")


if __name__ == "__main__":
    main()
