"""Partitioned Bloom URL-seen prefilter (SURVEY.md §4.2 item 1).

The reference's URL-seen is an exact in-memory ``set``
(/root/reference/backend/domain/entities.py:153); at 10^10-frontier scale
the engine splits membership into (a) this Bloom prefilter — per-partition
bit-array blobs stored as a state table, co-partitioned with the frontier
by ``pmod(xxhash64(url), P)`` — and (b) an exact anti-join against the
seen table for the maybe-seen fraction only. Bloom has no false negatives,
so rows it clears are *definitely new* and skip the exact join entirely;
URL-seen membership stays exact, as the north rule requires.

Hashing is JVM-side (``F.xxhash64`` twice with different seed columns);
Python only ORs numpy bitmaps inside Arrow batches — no per-row Python.

Scale math (design point): 10^10 URLs at 1% fpp ≈ 12 GiB of bitmap total,
sharded across P=4096 partitions ≈ 3 MiB per blob — each executor probes
only its partition's blob; nothing is driver-resident.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "add_bloom_keys",
    "build_bloom",
    "update_bloom",
    "advance_bloom",
    "bloom_fill",
    "bloom_prefilter",
    "K_PROBES",
]

K_PROBES = 5


def add_bloom_keys(df: DataFrame, url_col: str = "url", n_parts: int = 64) -> DataFrame:
    """JVM-side keys: partition id + two independent 64-bit hashes
    (double-hashing h1 + i*h2 generates the k probe positions)."""
    return (
        df.withColumn("h1", F.xxhash64(url_col))
        .withColumn("h2", F.xxhash64(url_col, F.lit(1)))
        .withColumn("bloom_part", F.pmod(F.xxhash64(url_col, F.lit(2)), F.lit(n_parts)).cast("int"))
    )


def _positions(h1: np.ndarray, h2: np.ndarray, m_bits: int) -> Iterator[np.ndarray]:
    h1u = h1.astype(np.uint64)
    h2u = h2.astype(np.uint64) | np.uint64(1)  # odd => full-cycle stride
    for i in range(K_PROBES):
        yield ((h1u + np.uint64(i) * h2u) % np.uint64(m_bits)).astype(np.int64)


def set_bits(bits: np.ndarray, h1: np.ndarray, h2: np.ndarray, m_bits: int) -> None:
    """OR the k probe positions of (h1,h2) into the bitmap (uint8 array)."""
    for pos in _positions(h1, h2, m_bits):
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))


def probe_bits(bits: np.ndarray, h1: np.ndarray, h2: np.ndarray, m_bits: int) -> np.ndarray:
    """Vectorized membership probe; True = maybe present (never a false
    negative for keys previously set with set_bits)."""
    maybe = np.ones(len(h1), dtype=bool)
    for pos in _positions(h1, h2, m_bits):
        maybe &= (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1 == 1
    return maybe


BITS_PER_KEY = 16  # ~0.05% fpp at k=5


def build_bloom(
    seen: DataFrame, n_parts: int = 64, m_bits_per_part: int | None = None
) -> DataFrame:
    """Build per-partition Bloom blobs from the seen table.
    Returns (bloom_part:int, blob:binary). Stored as a state table and
    rebuilt incrementally by OR-ing each batch's new URLs into its blob.

    m_bits_per_part=None sizes the bitmap from the actual key count
    (BITS_PER_KEY bits per key, rounded up to a power of two, >= 2^13) —
    an oversized filter wastes the exact bytes that make broadcast
    delivery cheap."""
    if m_bits_per_part is None:
        n_keys = seen.count()
        need = max(1 << 13, (n_keys * BITS_PER_KEY) // max(n_parts, 1))
        m_bits_per_part = 1 << (need - 1).bit_length()
    keyed = add_bloom_keys(seen, n_parts=n_parts)

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m_bits_per_part // 8, dtype=np.uint8)
        set_bits(bits, pdf["h1"].to_numpy(), pdf["h2"].to_numpy(), m_bits_per_part)
        return pd.DataFrame({"bloom_part": [int(pdf["bloom_part"].iloc[0])], "blob": [bits.tobytes()]})

    return (
        keyed.select("bloom_part", "h1", "h2")
        .groupBy("bloom_part")
        .applyInPandas(_build, "bloom_part int, blob binary")
    )


def update_bloom(
    bloom: DataFrame,
    new_seen: DataFrame,
    url_col: str = "url",
    n_parts: int = 64,
    m_bits_per_part: int | None = None,
) -> DataFrame:
    """OR one batch's newly-seen URLs into an existing partitioned Bloom
    filter — the incremental path of a long-running drain loop. Rebuilding
    from the full seen table is O(|seen|) *per batch* (quadratic over a
    crawl); this touches only the batch's keys plus the 64-row blob table,
    so per-batch cost tracks the batch, as the 10^10 design point needs.

    Exactness: ``set_bits`` is a deterministic bitwise OR, so for a fixed
    bitmap width ``update_bloom(build_bloom(A, m), B)`` is blob-for-blob
    IDENTICAL to ``build_bloom(A | B, m)`` (pinned by test) — incremental
    maintenance loses nothing vs a rebuild at the same width.

    Capacity contract: a Bloom bitmap cannot grow in place — size the
    initial build for the crawl's expected seen count (``m_bits_per_part``
    on ``build_bloom``; BITS_PER_KEY=16 per expected key keeps fpp ~0.05%)
    and watch saturation with ``bloom_fill``: past ~50% bit-fill, rebuild
    wider from the seen table (one O(|seen|) job per *doubling*, amortized
    O(1) per batch — the classic dynamic-array argument).

    m_bits_per_part=None infers the width from the widest existing blob
    (one tiny 64-row agg); pass it explicitly to skip that job in a
    per-batch loop, or when ``bloom`` may have no rows yet (an empty
    DataFrame carries no width to inherit — inferring raises ValueError).

    Partitions with new keys but no existing blob (build_bloom emits no
    row for a partition whose seen-slice was empty) get a fresh bitmap;
    partitions with no new keys pass their blob through untouched.

    Lifecycle note: in a multi-batch loop, commit each update to a state
    table (parquet/snapshot-store write, read back) rather than chaining
    ``persist()`` handles — a cached chain keeps every prior batch's
    cogroup in its lineage, and one evicted block silently recomputes the
    whole history (tools/scale_frontier_loop.py documents the measured
    failure). State tables cut lineage at the batch boundary, which is
    how the engine's SnapshotParquetStore treats all its tables.
    """
    if m_bits_per_part is None:
        widest = bloom.agg(F.max(F.length("blob"))).first()[0]
        if not widest:
            raise ValueError(
                "update_bloom: cannot infer bitmap width from an empty bloom "
                "table — pass m_bits_per_part explicitly"
            )
        m_bits_per_part = int(widest) * 8
    m_bits = int(m_bits_per_part)
    keyed = add_bloom_keys(new_seen, url_col=url_col, n_parts=n_parts).select(
        "bloom_part", "h1", "h2"
    )

    def _upd(blobs: pd.DataFrame, keys: pd.DataFrame) -> pd.DataFrame:
        part = int(blobs["bloom_part"].iloc[0] if len(blobs) else keys["bloom_part"].iloc[0])
        if len(blobs):
            bits = np.frombuffer(blobs["blob"].iloc[0], dtype=np.uint8).copy()
        else:
            bits = np.zeros(m_bits // 8, dtype=np.uint8)
        if len(keys):
            set_bits(bits, keys["h1"].to_numpy(), keys["h2"].to_numpy(), len(bits) * 8)
        return pd.DataFrame({"bloom_part": [part], "blob": [bits.tobytes()]})

    return (
        bloom.groupBy("bloom_part")
        .cogroup(keyed.groupBy("bloom_part"))
        .applyInPandas(_upd, "bloom_part int, blob binary")
    )


def advance_bloom(
    bloom: DataFrame,
    new_seen: DataFrame,
    full_seen: DataFrame,
    url_col: str = "url",
    n_parts: int = 64,
    m_bits_per_part: int | None = None,
    rebuild_fill: float = 0.5,
) -> tuple[DataFrame, dict]:
    """One drain-batch advance of the seen-filter state: OR the batch's
    newly-seen URLs in (update_bloom), then check saturation and rebuild
    wider from the full seen table when max per-partition fill crosses
    ``rebuild_fill`` — the executable form of the capacity contract.

    Width doubles on rebuild (and re-derives from the actual seen count
    if that asks for more), so rebuilds happen once per doubling of the
    seen set: amortized O(1) per batch, never O(|seen|) per batch. At
    fill 0.5 and k=5 probes fpp is ~3% — still safe (the exact anti-join
    resolves every maybe-seen), but the maybe slice starts to cost real
    join work, which is the right moment to spend one rebuild.

    Returns ``(bloom', info)``; info carries fill_max and, when a
    rebuild fired, the old/new widths. The returned blobs are
    local-checkpointed (materialized, lineage cut): the fill check below
    must not evaluate the un-materialized update cogroup once for the
    popcount and leave the caller's materialization to evaluate it a
    second time — the same double-evaluation cost SeenState.commit_batch
    measured and removed via its commit-then-fill-check ordering. State
    tables outlive the batch either way; a caller that commits the
    result to a store re-cuts lineage at the committed files.

    Checkpoint lifetime: localCheckpoint blocks are released when the
    returned DataFrame is garbage-collected (ContextCleaner), not by
    unpersist() — a long multi-batch loop holding many returned handles
    accumulates superseded blob copies until GC. Loop-grade drains
    should use SeenState (per-batch committed tables, deterministic
    file lifecycle) rather than chaining advance_bloom returns.
    """
    if m_bits_per_part is None:
        widest = bloom.agg(F.max(F.length("blob"))).first()[0]
        if not widest:
            raise ValueError(
                "advance_bloom: cannot infer bitmap width from an empty bloom "
                "table — pass m_bits_per_part explicitly"
            )
        m_bits_per_part = int(widest) * 8
    out = update_bloom(
        bloom, new_seen, url_col=url_col, n_parts=n_parts, m_bits_per_part=m_bits_per_part
    ).localCheckpoint()
    fill_max = bloom_fill(out).agg(F.max("fill")).first()[0] or 0.0
    info = {"fill_max": float(fill_max), "rebuilt": False, "m_bits_per_part": m_bits_per_part}
    if fill_max > rebuild_fill:
        n_keys = full_seen.count()
        need = max(m_bits_per_part * 2, (n_keys * BITS_PER_KEY) // max(n_parts, 1))
        new_m = 1 << (need - 1).bit_length()
        # same checkpoint contract as the update path: the rebuild is the
        # drain's most expensive batch — a caller evaluating the result
        # twice must not pay the O(|seen|) build twice
        out = build_bloom(
            full_seen.select(F.col(url_col).alias("url")),
            n_parts=n_parts,
            m_bits_per_part=new_m,
        ).localCheckpoint()
        info.update(rebuilt=True, m_bits_per_part=new_m, m_bits_before=m_bits_per_part)
    return out, info


def bloom_fill(bloom: DataFrame) -> DataFrame:
    """Per-partition saturation report: (bloom_part, m_bits, bits_set,
    fill). fill is the fraction of set bits — the drain loop's rebuild
    trigger (fpp ≈ fill^k; at fill 0.5 and k=5 that is ~3%, time to
    rebuild wider). One pandas popcount over the 64-row blob table."""

    def _fill(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, r in pdf.iterrows():
            bits = np.frombuffer(r["blob"], dtype=np.uint8)
            ones = int(np.unpackbits(bits).sum())
            out.append((int(r["bloom_part"]), len(bits) * 8, ones, ones / (len(bits) * 8)))
        return pd.DataFrame(out, columns=["bloom_part", "m_bits", "bits_set", "fill"])

    return bloom.mapInPandas(
        lambda it: (_fill(pdf) for pdf in it),
        "bloom_part int, m_bits bigint, bits_set bigint, fill double",
    )


BROADCAST_BLOOM_MAX_BYTES = 128 << 20


def bloom_prefilter(
    candidates: DataFrame,
    bloom: DataFrame,
    n_parts: int = 64,
    mode: str = "auto",
) -> DataFrame:
    """Tag candidates with ``maybe_seen``. The bitmap width is carried by
    the blob itself (m_bits = 8 * len(blob)); maybe_seen=false is
    authoritative (no false negatives). n_parts MUST match the build.

    Delivery of the blobs to the probe tasks:
    - ``cogroup``: shuffle candidates by bloom_part; each task probes
      exactly one blob. The only option at 10^10 scale (total filter ~15
      GiB — never driver- or executor-resident in full).
    - ``broadcast``: ship ALL blobs to every executor, probe inside
      mapInPandas in the same stage as the scan — zero shuffle. Right
      whenever the filter fits comfortably in an executor (<~128 MiB).
    - ``auto`` (default): broadcast when the total blob size is under
      BROADCAST_BLOOM_MAX_BYTES, else cogroup — the same auto-threshold
      logic Spark applies to broadcast joins."""
    keyed = add_bloom_keys(candidates, n_parts=n_parts)

    if mode == "auto" or mode == "broadcast":
        blobs = {int(r.bloom_part): bytes(r.blob) for r in bloom.collect()} if (
            mode == "broadcast"
        ) else None
        if blobs is None:
            # peek at size cheaply: one blob * n_parts upper bound
            first = bloom.select("blob").head(1)
            est = (len(first[0].blob) if first else 0) * n_parts
            if est <= BROADCAST_BLOOM_MAX_BYTES:
                blobs = {int(r.bloom_part): bytes(r.blob) for r in bloom.collect()}
        if blobs is not None:
            import pyarrow as pa

            bcast = candidates.sparkSession.sparkContext.broadcast(blobs)
            names = [f.name for f in candidates.schema.fields] + ["maybe_seen"]

            def _probe_bcast(it):
                # mapInArrow: the candidate string columns pass through as
                # Arrow buffers — no pandas object materialization (which
                # anti-scales past ~8 workers on allocator contention).
                local = bcast.value
                for b in it:
                    parts = b.column("bloom_part").to_numpy()
                    h1 = b.column("h1").to_numpy()
                    h2 = b.column("h2").to_numpy()
                    maybe = np.zeros(len(parts), dtype=bool)
                    for part in np.unique(parts):
                        blob = local.get(int(part))
                        if blob is None:
                            continue
                        sel = parts == part
                        bits = np.frombuffer(blob, dtype=np.uint8)
                        maybe[sel] = probe_bits(bits, h1[sel], h2[sel], len(bits) * 8)
                    keep = [b.column(n) for n in names[:-1]]
                    yield pa.record_batch(keep + [pa.array(maybe)], names=names)

            out_schema = ", ".join(
                f"{f.name} {f.dataType.simpleString()}" for f in candidates.schema.fields
            ) + ", maybe_seen boolean"
            return keyed.mapInArrow(_probe_bcast, out_schema)

    def _probe(cands: pd.DataFrame, blobs: pd.DataFrame) -> pd.DataFrame:
        out = cands.drop(columns=["h1", "h2"])
        if not len(cands) or not len(blobs):
            # no blob => nothing seen in this partition
            out["maybe_seen"] = pd.Series([False] * len(cands), dtype=bool)
            return out
        bits = np.frombuffer(blobs["blob"].iloc[0], dtype=np.uint8)
        out["maybe_seen"] = probe_bits(
            bits, cands["h1"].to_numpy(), cands["h2"].to_numpy(), len(bits) * 8
        )
        return out

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in keyed.drop("h1", "h2").schema.fields
    ) + ", maybe_seen boolean"
    return (
        keyed.groupBy("bloom_part")
        .cogroup(bloom.groupBy("bloom_part"))
        .applyInPandas(_probe, out_schema)
        .drop("bloom_part")
    )
