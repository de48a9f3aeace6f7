"""crawler_spark — a from-scratch PySpark-native URL-frontier + fetch scheduler.

Re-expresses the capabilities of the reference crawler
(keanu-thakalath/crawler, studied read-only at /root/reference) as an
idiomatic Spark engine:

- URL canonicalization (reference parity + RFC 3986 extended) as
  Arrow-vectorized pandas UDFs (``crawler_spark.functions.urlnorm``).
- Link extraction / interleaved-span parsing (``crawler_spark.functions.linkextract``).
- A partitioned, micro-batched frontier drain with per-host ordering,
  politeness, robots rules, Bloom-prefiltered URL-seen dedup
  (``crawler_spark.operators.frontier``).
- Snapshot-committed state tables with lineage + resume
  (``crawler_spark.state``).
- A relational query surface mirroring the reference's views
  (``crawler_spark.queries``).

Nothing here is a code port: the reference defines WHAT (loop semantics,
link classification, span ordering); the HOW is DataFrame/Catalyst.
"""

__version__ = "0.1.0"
