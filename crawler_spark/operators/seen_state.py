"""URL-seen state for a long-running frontier drain — the product form of
the state discipline tools/scale_frontier_loop.py measures at 10^9.

One `SeenState` owns two tables in a SnapshotParquetStore:

- ``url_seen`` (delta): append-only URL rows, the exact side of the
  membership check (bloom maybe-seens anti-join against it).
- ``seen_bloom`` (full): the partitioned Bloom blobs, OR-ed forward each
  batch via ``update_bloom`` and fill-checked on the committed files
  (rebuild-wider from the full seen table past the saturation
  threshold — amortized O(1) per batch).

Committing through the store (rather than chaining ``persist()`` handles
or ad-hoc parquet dirs) buys the drain loop what the crawl engine's
tables already have: atomic per-batch commits, exact resume from HEAD,
idempotent redelivery (re-committing an old batch_id is a no-op — new
URLs can never double-append), snapshot history/expiry, and lineage cut
at every batch boundary (the cached-chain recompute failure measured in
the 10^9 run cannot occur, because each batch reads the previous batch's
blobs from committed files).

Reference contrast: the reference's URL-seen is a per-crawl in-memory
``set`` lost on crash (/root/reference/backend/domain/entities.py:153);
this is its 10^10-frontier replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..state import Manifest, SnapshotParquetStore
from .bloom import BITS_PER_KEY, bloom_fill, build_bloom, update_bloom

__all__ = ["SeenState"]


class SeenState:
    TABLE_SEEN = "url_seen"
    TABLE_BLOOM = "seen_bloom"

    BUCKET_COL = "seen_bucket"

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n_parts: int = 64,
        expected_keys: int = 10_000_000,
        rebuild_fill: float = 0.5,
        url_col: str = "url",
        bucketed_parts: int | None = None,
        write_tasks: int = 64,
    ):
        """``expected_keys`` sizes the initial Bloom (BITS_PER_KEY bits per
        expected seen URL); undersizing is safe — advance_bloom rebuilds
        wider when fill crosses ``rebuild_fill``. On resume the width is
        inferred from the committed blobs, so the parameter only matters
        for a fresh store.

        ``bucketed_parts`` (B) turns on the hash-bucketed url_seen
        layout: rows land under ``seen_bucket=<pmod(xxhash64(url,2),B)>``
        hive directories, and :meth:`anti_join` resolves the maybe-seen
        slice bucket-wise — each task opens its bucket's parquet files
        directly (pyarrow), so the accumulated seen table is NEVER
        shuffled; only the (small, post-Bloom) candidate slice is. This
        is the per-batch cost that otherwise tracks ACCUMULATED state:
        the flat anti-join reshuffles ~4 GB of seen rows per batch at
        10^8 seen and grows linearly to 10^10. B must be a multiple of
        ``n_parts`` and the bucket hash is the Bloom's partition hash
        (seed 2), so bucket % n_parts == bloom_part — a per-part Bloom
        rebuild can read exactly the B/n_parts matching bucket dirs
        instead of the whole table. ``write_tasks`` caps the writer
        fan-out: new rows are hash-clustered so each bucket's files come
        from one task (~B files per commit, not tasks*B)."""
        self.spark = spark
        self.store = SnapshotParquetStore(spark, root)
        self.n_parts = n_parts
        self.rebuild_fill = rebuild_fill
        self.url_col = url_col
        if bucketed_parts is not None and bucketed_parts % n_parts != 0:
            raise ValueError(
                f"bucketed_parts ({bucketed_parts}) must be a multiple of "
                f"n_parts ({n_parts}) so bucket % n_parts == bloom_part"
            )
        self.bucketed_parts = bucketed_parts
        self.write_tasks = write_tasks
        need = max(1 << 13, expected_keys * BITS_PER_KEY // max(n_parts, 1))
        self._initial_m_bits = 1 << (need - 1).bit_length()
        self._empty = spark.createDataFrame([], f"{url_col} string")

    def _bucket_expr(self):
        # seed 2 == add_bloom_keys' bloom_part hash: with B a multiple of
        # n_parts, h mod n_parts == (h mod B) mod n_parts, so bucket dirs
        # refine the Bloom partitioning
        return F.pmod(
            F.xxhash64(self.url_col, F.lit(2)), F.lit(self.bucketed_parts)
        ).cast("int")

    # -- reads ----------------------------------------------------------------

    METRIC_LOGICAL = "seen_logical_batch"

    def batch_id(self) -> int:
        head = self.store.head()
        return head.batch_id if head else 0

    def last_logical(self) -> int:
        """The last LOGICAL batch id committed through ``commit_batch`` —
        the caller-facing counter the idempotent-redelivery guard checks.

        The store's ``batch_id`` counts COMMITS, and SeenState itself
        commits internally (a bloom rebuild, a compaction), so the two
        namespaces diverge: a caller supplying its own sequential
        batch_ids — the exact use case the redelivery contract invites —
        would otherwise have the first fresh batch after any
        rebuild/compaction silently classified as redelivered (its URLs
        never entering the seen state, re-scheduled forever). Every
        commit SeenState writes therefore carries the current logical id
        in its metrics, so the newest kept manifest always records it
        even after ``expire(keep_last=2)`` drops the data commit that
        introduced it. Falls back to the store batch_id for stores
        written before this metric existed (there the namespaces never
        diverged unless a rebuild/compact fired — such stores should
        resume with explicit batch_ids only after one fresh commit)."""
        for man in reversed(self.store.history()):
            lb = (man.metrics or {}).get(self.METRIC_LOGICAL)
            if lb is not None:
                return int(lb)
        head = self.store.head()
        return head.batch_id if head else 0

    def seen(self) -> DataFrame:
        df = self.store.read(self.TABLE_SEEN)
        return df if df is not None else self._empty

    def bloom(self) -> DataFrame:
        """Committed blobs (empty DataFrame before the first commit — the
        prefilter treats a missing blob as maybe_seen=false, and the
        exact anti-join side is equally empty, so batch 0 just works)."""
        df = self.store.read(self.TABLE_BLOOM)
        if df is not None:
            return df
        return build_bloom(
            self._empty, n_parts=self.n_parts, m_bits_per_part=self._initial_m_bits
        )

    def fill(self) -> DataFrame:
        return bloom_fill(self.bloom())

    def bucket_files(self) -> dict[int, list[str]]:
        """bucket id -> absolute parquet paths across every committed
        url_seen delta directory (driver-side directory listing over the
        manifest's file list — no Spark job). After a ``compact`` the
        list is one directory; between compactions it is one per batch."""
        if self.bucketed_parts is None:
            raise ValueError("bucket_files: store is not bucketed")
        import glob as _glob
        import os as _os

        head = self.store.head()
        out: dict[int, list[str]] = {}
        if head is None or self.TABLE_SEEN not in head.tables:
            return out
        for rel in head.tables[self.TABLE_SEEN]["files"]:
            base = _os.path.join(self.store.root, "snapshots", rel)
            for d in _glob.glob(_os.path.join(base, f"{self.BUCKET_COL}=*")):
                b = int(d.rsplit("=", 1)[1])
                out.setdefault(b, []).extend(
                    _glob.glob(_os.path.join(d, "*.parquet"))
                )
        return out

    def anti_join(self, candidates: DataFrame, url_col: str | None = None) -> DataFrame:
        """Exact ``candidates LEFT ANTI JOIN url_seen ON url`` without
        shuffling the seen table — the bucket-wise join the 10^10 design
        point needs (a flat anti-join reshuffles the ENTIRE accumulated
        seen table every batch; this shuffles only the candidate slice,
        which after the Bloom prefilter is the maybe-seen fraction).

        Candidates are hash-clustered by the layout's bucket key; each
        task then opens ONLY its bucket's committed parquet files
        (pyarrow, url column, ~|seen|/B rows) and drops candidates whose
        url appears — membership compares full URLs, so the result is
        exact, not fingerprint-approximate. Buckets with no candidates
        are never read. The reference analog is the in-memory ``set``
        lookup (/root/reference/backend/domain/entities.py:153,158-159);
        a real cluster swaps this for an Iceberg bucket-partitioned
        storage-partitioned join, same layout contract."""
        if self.bucketed_parts is None:
            raise ValueError("anti_join: store is not bucketed")
        url_col = url_col or self.url_col
        fmap = self.bucket_files()
        if not fmap:
            return candidates
        bc = self.spark.sparkContext.broadcast(fmap)
        out_schema = candidates.schema
        keyed = candidates.withColumn(
            "_sb",
            F.pmod(F.xxhash64(url_col, F.lit(2)), F.lit(self.bucketed_parts)).cast("int"),
        )
        names = [f.name for f in out_schema.fields]

        def _aj(pdf):
            import pyarrow as pa
            import pyarrow.compute as pc
            import pyarrow.parquet as pq

            out = pdf[names]
            files = bc.value.get(int(pdf["_sb"].iloc[0]))
            if not files or not len(pdf):
                return out
            seen_urls = pq.read_table(files, columns=[url_col]).column(url_col)
            mask = pc.is_in(
                pa.array(pdf[url_col]), value_set=seen_urls.combine_chunks()
            )
            return out[~mask.to_numpy(zero_copy_only=False)]

        return keyed.groupBy("_sb").applyInPandas(_aj, out_schema)

    # -- writes ---------------------------------------------------------------

    def commit_batch(
        self,
        new_seen: DataFrame,
        batch_id: int | None = None,
        metrics: dict | None = None,
    ) -> tuple[Manifest, dict]:
        """Commit one batch's newly-seen URLs: append to ``url_seen``,
        OR the batch into the Bloom (update_bloom), write both
        atomically; then fill-check the committed blobs and rebuild
        wider in a follow-up commit when saturation crosses
        ``rebuild_fill``. Returns (manifest, info) — info reports
        fill_max, rebuilt, and the widths.

        ``new_seen`` must carry the state's url column and be
        deduplicated against the current seen set (schedule_batch output
        already is — that is what scheduling MEANS); re-appending an
        already-seen URL is harmless for membership but inflates the
        seen table. Re-committing an already-committed batch_id is a
        no-op (guarded on the LOGICAL counter, see ``last_logical`` —
        the store's own batch_id also counts internal rebuild/compact
        commits, so it cannot be the redelivery namespace)."""
        head = self.store.head()
        last = self.last_logical()
        bid = batch_id if batch_id is not None else last + 1
        if head is not None and bid <= last:
            return head, {"redelivered": True}
        bloom = self.bloom()
        has_blobs = bool(
            head and head.tables.get(self.TABLE_BLOOM, {}).get("rows", 0)
        )
        if has_blobs:
            # resume/steady state: infer the width from the committed
            # blobs so a past rebuild's wider width is honored (one
            # 64-row agg over the parquet blob table)
            m_bits = int(bloom.agg(F.max(F.length("blob"))).first()[0]) * 8
        else:
            m_bits = self._initial_m_bits
        new_urls = new_seen.select(F.col(self.url_col))
        pcols = None
        if self.bucketed_parts is not None:
            # cluster the batch's rows by bucket BEFORE the partitioned
            # write: each bucket's files then come from exactly one task
            # (~B files per commit instead of tasks*B splinters)
            new_urls = new_urls.withColumn(
                self.BUCKET_COL, self._bucket_expr()
            ).repartition(self.write_tasks, F.col(self.BUCKET_COL))
            pcols = {self.TABLE_SEEN: [self.BUCKET_COL]}
        out = update_bloom(
            bloom, new_urls, url_col=self.url_col, n_parts=self.n_parts,
            m_bits_per_part=m_bits,
        )
        # Commit FIRST, fill-check the COMMITTED blobs after: checking
        # fill on the un-materialized update would evaluate the whole
        # cogroup twice (once for the check, again for the write) —
        # measured as the bulk of per-batch state cost at 10^8-row
        # batches. The post-commit check is a popcount over the written
        # parquet; the rare rebuild lands as a follow-up commit (same
        # amortized-doubling contract, one extra snapshot per doubling).
        man = self.store.commit(
            head.batch_id + 1 if head else 1,
            full_tables={self.TABLE_BLOOM: out},
            delta_tables={self.TABLE_SEEN: new_urls},
            metrics={**(metrics or {}), self.METRIC_LOGICAL: bid},
            partition_cols=pcols,
        )
        fill_max = float(
            bloom_fill(self.bloom()).agg(F.max("fill")).first()[0] or 0.0
        )
        info = {"fill_max": fill_max, "rebuilt": False, "m_bits_per_part": m_bits}
        if fill_max > self.rebuild_fill:
            full_seen = self.seen()
            n_keys = full_seen.count()
            need = max(m_bits * 2, (n_keys * BITS_PER_KEY) // max(self.n_parts, 1))
            new_m = 1 << (need - 1).bit_length()
            rebuilt = build_bloom(
                full_seen.select(F.col(self.url_col).alias("url")),
                n_parts=self.n_parts,
                m_bits_per_part=new_m,
            )
            man = self.store.commit(
                man.batch_id + 1,
                full_tables={self.TABLE_BLOOM: rebuilt},
                metrics={
                    "event": "bloom_rebuild",
                    "fill_max": fill_max,
                    "m_bits_before": m_bits,
                    "m_bits_per_part": new_m,
                    self.METRIC_LOGICAL: bid,
                },
            )
            info.update(rebuilt=True, m_bits_before=m_bits, m_bits_per_part=new_m)
        return man, info

    def expire(self, keep_last: int = 2) -> dict:
        """Drop old snapshots' files. Retention is directory-granular and
        every snapshot dir stays referenced through the url_seen delta
        chain, so superseded blob files inside kept-but-old dirs reclaim
        only after ``compact`` rewrites the delta history into one dir:
        call ``compact("url_seen")`` every N batches (the engine's own
        cadence) and expire then — history cost stays ~keep_last blob
        tables, not one per batch."""
        return self.store.expire_snapshots(keep_last=keep_last)

    def compact(self, n_files: int = 8) -> Manifest:
        """Rewrite the url_seen delta history into one snapshot's files
        (read path shrinks; a following expire() reclaims the old dirs —
        including every superseded blob table that shared them). The
        compaction commit carries the current logical batch id forward
        so ``last_logical`` (and any loop cursor) survives even when
        ``expire(keep_last=2)`` keeps only (rebuild, compact) manifests
        from an iteration that triggered both."""
        return self.store.compact(
            self.TABLE_SEEN,
            n_files=n_files,
            extra_metrics={self.METRIC_LOGICAL: self.last_logical()},
        )
