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
from .cuckoo import (
    BUCKET_SLOTS,
    build_cuckoo,
    cuckoo_load,
    delete_from_cuckoo,
    insert_into_cuckoo,
)

__all__ = ["SeenState"]


class SeenState:
    TABLE_SEEN = "url_seen"
    TABLE_BLOOM = "seen_bloom"
    TABLE_CUCKOO = "seen_cuckoo"
    TABLE_DELETED = "url_deleted"

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
        filter_kind: str = "bloom",
        stagger_parts: int | None = None,
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
        from one task (~B files per commit, not tasks*B).

        ``filter_kind`` picks the prefilter blob family: ``"bloom"``
        (default; operators/bloom.py) or ``"cuckoo"``
        (operators/cuckoo.py) — same partition contract, but cuckoo
        supports DELETION: :meth:`delete_urls` evicts fingerprints so
        ``delete_source`` at drain scale keeps the prefilter truthful
        without a rebuild (a Bloom bit is shared by unknown other keys
        and can never be unset; reference analog: page rows deleted with
        their source, /root/reference/backend/service/services.py:317-324).
        For cuckoo, ``rebuild_fill`` is the slot-load threshold (the
        filter rebuilds wider BEFORE an insert that would start from a
        load above it — cuckoo inserts fail their kick walks near
        LOAD_FACTOR instead of degrading like Bloom fpp does).

        ``stagger_parts`` (Bloom only) bounds the saturation rebuild to
        at most that many worst-fill partitions per batch instead of all
        ``n_parts`` at once: the amortized-doubling cost stays O(1) per
        batch either way, but no single batch pays the whole doubling
        (at 10^10 seen a full rebuild is a full-table scan + global
        rebuild inside one commit window — a maintenance PAUSE; the
        staggered form spreads it over ~n_parts/stagger_parts batches
        while saturation degrades only fpp, never correctness, since the
        exact tier resolves every maybe). With the bucketed layout the
        per-part rebuild reads exactly the B/n_parts bucket directories
        whose rows hash to the rebuilt partitions (bucket % n_parts ==
        bloom_part), not the whole seen table."""
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
        if filter_kind not in ("bloom", "cuckoo"):
            raise ValueError(f"filter_kind must be 'bloom' or 'cuckoo', got {filter_kind!r}")
        self.filter_kind = filter_kind
        self.stagger_parts = stagger_parts
        need = max(1 << 13, expected_keys * BITS_PER_KEY // max(n_parts, 1))
        self._initial_m_bits = 1 << (need - 1).bit_length()
        # cuckoo geometry: slots for expected_keys at ~LOAD_FACTOR-with-
        # headroom occupancy, power-of-two buckets per partition
        nb_need = max(256, expected_keys // max(n_parts, 1) // (BUCKET_SLOTS * 2) * 3)
        self._initial_buckets = 1 << (nb_need - 1).bit_length()
        self._empty = spark.createDataFrame([], f"{url_col} string")

    @staticmethod
    def _part_expr(url_col: str, modulus: int):
        """THE layout hash: seed 2 == add_bloom_keys'/add_cuckoo_keys'
        part hash. Every bucket/part derivation in this class MUST go
        through here — the contract bucket % n_parts == bloom_part holds
        only while the expression is byte-identical everywhere."""
        return F.pmod(F.xxhash64(url_col, F.lit(2)), F.lit(modulus)).cast("int")

    def _bucket_expr(self):
        # with B a multiple of n_parts, h mod n_parts == (h mod B) mod
        # n_parts, so bucket dirs refine the Bloom partitioning
        return self._part_expr(self.url_col, self.bucketed_parts)

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
        introduced it. HEAD is checked first — every commit this code
        writes carries the metric, so the full-history walk (one JSON
        read per kept manifest) only runs for stores written by older
        code; without the head fast-path a never-expiring drain would
        pay O(batches) driver-side file reads per commit, O(batches^2)
        over the run. Legacy fallbacks, in order: the drain loop's
        ``loop_batch`` journal (+1 — it records the completed window
        index) and only then the store batch_id; the store counter also
        counts internal rebuild/compact commits, so using it where a
        loop journal exists would classify the first post-resume
        windows as redelivered and silently drop their URLs."""
        head = self.store.head()
        if head is None:
            return 0
        lb = (head.metrics or {}).get(self.METRIC_LOGICAL)
        if lb is not None:
            return int(lb)
        hist = self.store.history()
        legacy_loop = None
        for man in reversed(hist):
            m = man.metrics or {}
            if self.METRIC_LOGICAL in m:
                return int(m[self.METRIC_LOGICAL])
            if legacy_loop is None and "loop_batch" in m:
                legacy_loop = int(m["loop_batch"]) + 1
        if legacy_loop is not None:
            return legacy_loop
        return head.batch_id

    @property
    def filter_table(self) -> str:
        return self.TABLE_CUCKOO if self.filter_kind == "cuckoo" else self.TABLE_BLOOM

    def seen(self) -> DataFrame:
        """The exact membership side: every committed url MINUS the
        tombstoned (deleted) ones — a deleted source's URLs are
        re-crawlable, exactly the reference's delete-pages-with-source
        semantics. The tombstone anti-join only appears in the plan when
        deletions exist."""
        df = self.store.read(self.TABLE_SEEN)
        if df is None:
            return self._empty
        dels = self.store.read(self.TABLE_DELETED)
        if dels is not None:
            df = df.join(dels.select(self.url_col), self.url_col, "left_anti")
        return df

    def deleted(self) -> DataFrame:
        """Tombstoned URLs awaiting physical purge (apply_deletes)."""
        df = self.store.read(self.TABLE_DELETED)
        return df if df is not None else self._empty

    def blobs(self) -> DataFrame:
        """Committed prefilter blobs of the configured ``filter_kind``
        (empty DataFrame before the first commit — the prefilter treats
        a missing blob as maybe_seen=false, and the exact anti-join side
        is equally empty, so batch 0 just works). Resuming a store that
        was committed with the OTHER filter kind refuses loudly: a
        silently-empty prefilter would tag every previously seen URL
        definitely-new, and the definitely-new branch bypasses the exact
        anti-join entirely — the one error class the two-tier design
        cannot absorb. Migrate with ``rebuild_filter()`` instead."""
        head = self.store.head()
        df = self.store.read(self.filter_table)
        if df is not None:
            if head is not None and not head.tables.get(
                self.filter_table, {}
            ).get("rows", 0) and head.tables.get(self.TABLE_SEEN, {}).get("rows", 0):
                raise ValueError(
                    f"blobs: {self.filter_table} is EMPTY while url_seen has "
                    "rows (a cleared filter after a kind migration?) — call "
                    "rebuild_filter() before scheduling against this state"
                )
            return df
        other = (
            self.TABLE_BLOOM if self.filter_kind == "cuckoo" else self.TABLE_CUCKOO
        )
        if head is not None and head.tables.get(other, {}).get("rows", 0):
            raise ValueError(
                f"blobs: store was committed with filter_kind="
                f"{'bloom' if other == self.TABLE_BLOOM else 'cuckoo'!r} but "
                f"this SeenState is {self.filter_kind!r} — an empty "
                f"{self.filter_table} would re-crawl every seen URL; resume "
                "with the original kind or migrate via rebuild_filter()"
            )
        if self.filter_kind == "cuckoo":
            return build_cuckoo(
                self._empty, n_parts=self.n_parts, n_buckets=self._initial_buckets
            )
        return build_bloom(
            self._empty, n_parts=self.n_parts, m_bits_per_part=self._initial_m_bits
        )

    def bloom(self) -> DataFrame:
        """Back-compat alias of :meth:`blobs` (named when Bloom was the
        only filter kind; schedule_batch's ``bloom=`` arg carries either
        family, dispatched by its ``seen_filter``)."""
        return self.blobs()

    def fill(self) -> DataFrame:
        """Saturation report for the configured filter kind — columns
        (part, capacity, used, fill): Bloom bit-fill or cuckoo slot-load,
        normalized so the drain loop's reporting reads one shape."""
        if self.filter_kind == "cuckoo":
            return cuckoo_load(self.blobs()).select(
                F.col("cuckoo_part").alias("bloom_part"),
                (F.col("n_buckets") * BUCKET_SLOTS).alias("m_bits"),
                F.col("slots_used").alias("bits_set"),
                F.col("load").alias("fill"),
            )
        return bloom_fill(self.blobs())

    def bucket_files(self, table: str | None = None) -> dict[int, list[str]]:
        """bucket id -> absolute parquet paths across every committed
        delta directory of ``table`` (default url_seen; driver-side
        directory listing over the manifest's file list — no Spark job).
        After a ``compact`` the list is one directory; between
        compactions it is one per batch."""
        if self.bucketed_parts is None:
            raise ValueError("bucket_files: store is not bucketed")
        import glob as _glob
        import os as _os

        table = table or self.TABLE_SEEN
        head = self.store.head()
        out: dict[int, list[str]] = {}
        if head is None or table not in head.tables:
            return out
        entry = head.tables[table]
        if entry.get("rows", 0) and not entry.get("partition_cols"):
            # a committed FLAT table under a bucketed SeenState would make
            # the bucket-wise reader silently see an empty map — every
            # previously-crawled URL re-scheduled, and the next partitioned
            # delta would wedge the union read on mixed schemas. Refuse.
            raise ValueError(
                f"bucket_files: table {table!r} was committed WITHOUT the "
                "bucketed layout (no partition_cols in the manifest) — a "
                "flat store cannot be resumed with bucketed_parts; rebuild "
                "the state or resume without bucketing"
            )
        for rel in entry["files"]:
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
        dmap = self.bucket_files(self.TABLE_DELETED)
        # one live broadcast per snapshot epoch: a drain loop calls this
        # every batch, and an un-released broadcast per batch pins the
        # full path map on driver+executors for the run's lifetime (the
        # same leak class schedule_batch's barrier contract documents).
        head = self.store.head()
        epoch = head.snapshot_id if head else -1
        cached = getattr(self, "_aj_bcast", None)
        if cached is not None and cached[0] == epoch:
            bc = cached[1]
        else:
            if cached is not None:
                # unpersist (not destroy): frees the executor copies while a
                # not-yet-evaluated plan from the previous epoch can still
                # re-fetch from the driver; the driver holds at most ONE
                # superseded value, not one per batch
                try:
                    cached[1].unpersist()
                except Exception:
                    pass
            bc = self.spark.sparkContext.broadcast((fmap, dmap))
            self._aj_bcast = (epoch, bc)
        out_schema = candidates.schema
        keyed = candidates.withColumn(
            "_sb", self._part_expr(url_col, self.bucketed_parts)
        ).repartition(self.bucketed_parts, F.col("_sb"))
        names = [f.name for f in out_schema.fields]

        def _aj(batches):
            # mapInArrow, not applyInPandas: candidate strings stay Arrow
            # buffers end to end (pandas object materialization anti-
            # scales on allocator contention — same finding as
            # bloom_prefilter's broadcast probe). One task holds whole
            # buckets (hash repartition on _sb), so each bucket's seen
            # slice is read once per task and probed per Arrow batch.
            import numpy as np
            import pyarrow as pa
            import pyarrow.compute as pc
            import pyarrow.parquet as pq

            seen_files, del_files = bc.value
            cache: dict[int, object] = {}

            def _bucket_set(b: int):
                if b not in cache:
                    files = seen_files.get(b)
                    if not files:
                        cache[b] = None
                    else:
                        vals = pq.read_table(files, columns=[url_col]).column(url_col)
                        dels = del_files.get(b)
                        if dels:
                            # tombstoned urls are re-crawlable: NOT seen
                            gone = pq.read_table(dels, columns=[url_col]).column(
                                url_col
                            )
                            vals = pc.filter(
                                vals, pc.invert(pc.is_in(vals, value_set=gone.combine_chunks()))
                            )
                        cache[b] = vals.combine_chunks()
                return cache[b]

            for rb in batches:
                parts = rb.column("_sb").to_numpy()
                keep = [rb.column(n) for n in names]
                if not len(parts):
                    yield pa.record_batch(keep, names=names)
                    continue
                cand = rb.column(url_col)
                seen_mask = np.zeros(len(parts), dtype=bool)
                for b in np.unique(parts):
                    vset = _bucket_set(int(b))
                    if vset is None:
                        continue
                    sel = parts == b
                    sub = pc.is_in(
                        cand.take(pa.array(np.flatnonzero(sel))),
                        value_set=vset,
                    ).to_numpy(zero_copy_only=False)
                    seen_mask[sel] = sub
                tbl = pa.table(keep, names=names)
                yield from pa.table(
                    [c.filter(pa.array(~seen_mask)) for c in tbl.columns], names=names
                ).to_batches()

        return keyed.mapInArrow(_aj, out_schema)

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
        new_urls = new_seen.select(F.col(self.url_col))
        pcols = None
        if self.bucketed_parts is not None and head is not None:
            ent = head.tables.get(self.TABLE_SEEN, {})
            if ent.get("rows", 0) and not ent.get("partition_cols"):
                raise ValueError(
                    "commit_batch: store holds a FLAT url_seen table but "
                    "this SeenState is bucketed — a partitioned delta on "
                    "flat parents would wedge the union read (mixed "
                    "schemas); resume without bucketed_parts or rebuild"
                )
        if self.bucketed_parts is not None:
            # cluster the batch's rows by bucket BEFORE the partitioned
            # write: each bucket's files then come from exactly one task
            # (~B files per commit instead of tasks*B splinters)
            new_urls = new_urls.withColumn(
                self.BUCKET_COL, self._bucket_expr()
            ).repartition(self.write_tasks, F.col(self.BUCKET_COL))
            pcols = {
                self.TABLE_SEEN: [self.BUCKET_COL],
                self.TABLE_DELETED: [self.BUCKET_COL],
            }
        # a re-crawled url leaves the tombstone set (it is seen again);
        # tombstones are small (a deleted source's pages), so the rewrite
        # is cheap and only happens while deletions are pending
        full_extra: dict[str, DataFrame] = {}
        if head is not None and head.tables.get(self.TABLE_DELETED, {}).get("rows", 0):
            kept = self.store.read(self.TABLE_DELETED).join(
                new_urls.select(self.url_col), self.url_col, "left_anti"
            )
            full_extra[self.TABLE_DELETED] = kept
        if self.filter_kind == "cuckoo":
            return self._commit_cuckoo(head, bid, new_urls, pcols, metrics, full_extra)
        bloom = self.blobs()
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
            full_tables={self.TABLE_BLOOM: out, **full_extra},
            delta_tables={self.TABLE_SEEN: new_urls},
            metrics={**(metrics or {}), self.METRIC_LOGICAL: bid},
            partition_cols=pcols,
        )
        fill_max = float(
            bloom_fill(self.bloom()).agg(F.max("fill")).first()[0] or 0.0
        )
        info = {"fill_max": fill_max, "rebuilt": False, "m_bits_per_part": m_bits}
        if fill_max > self.rebuild_fill and self.stagger_parts:
            man, rinfo = self._stagger_rebuild(man, bid)
            info.update(rinfo)
        elif fill_max > self.rebuild_fill:
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

    def _stagger_rebuild(self, man: Manifest, bid: int) -> tuple[Manifest, dict]:
        """Rebuild at most ``stagger_parts`` worst-fill Bloom partitions
        at double their width (per-part amortized doubling). Mixed blob
        widths are first-class across the filter code — every probe and
        update derives the width from its own blob's length — so the
        filter stays fully usable mid-doubling. With the bucketed
        layout the rebuild rows come from exactly the bucket dirs whose
        bucket % n_parts lands in the rebuilt partitions (pyarrow-listed
        files, no full-table scan); otherwise from a filtered full
        scan."""
        fills = bloom_fill(self.blobs()).collect()  # n_parts rows
        worst = sorted(
            (r for r in fills if r.fill > self.rebuild_fill),
            key=lambda r: -r.fill,
        )[: self.stagger_parts]
        if not worst:
            return man, {}
        parts = sorted(int(r.bloom_part) for r in worst)
        new_m = 2 * max(int(r.m_bits) for r in worst)
        if self.bucketed_parts is not None:
            files = [
                f
                for b, fs in self.bucket_files().items()
                if b % self.n_parts in set(parts)
                for f in fs
            ]
            if files:
                rows = self.spark.read.parquet(*files).select(
                    F.col(self.url_col).alias("url")
                )
                head = self.store.head()
                if head and head.tables.get(self.TABLE_DELETED, {}).get("rows", 0):
                    rows = rows.join(
                        self.deleted().select(F.col(self.url_col).alias("url")),
                        "url",
                        "left_anti",
                    )
            else:
                # the saturated parts' rows were all purged (bits stay
                # set — Bloom bits are never unset): rebuild them empty
                # at the new width; build_bloom emits no blob for an
                # empty part and a missing blob probes definitely-new,
                # which is correct for a part with no seen rows
                rows = self._empty.select(F.col(self.url_col).alias("url"))
        else:
            rows = self.seen().select(F.col(self.url_col).alias("url"))
            rows = rows.filter(self._part_expr("url", self.n_parts).isin(parts))
        rebuilt = build_bloom(rows, n_parts=self.n_parts, m_bits_per_part=new_m)
        merged = self.blobs().filter(~F.col("bloom_part").isin(parts)).unionByName(
            rebuilt
        )
        man = self.store.commit(
            man.batch_id + 1,
            full_tables={self.TABLE_BLOOM: merged},
            metrics={
                "event": "bloom_rebuild_partial",
                "parts": ",".join(map(str, parts)),
                "m_bits_per_part": new_m,
                self.METRIC_LOGICAL: bid,
            },
            partition_cols=None,
        )
        return man, {
            "rebuilt": True,
            "staggered": True,
            "parts_rebuilt": parts,
            "m_bits_per_part": new_m,
        }

    def _commit_cuckoo(
        self,
        head: Manifest | None,
        bid: int,
        new_urls: DataFrame,
        pcols: dict | None,
        metrics: dict | None,
        full_extra: dict[str, DataFrame],
    ) -> tuple[Manifest, dict]:
        """Cuckoo data-commit path. Unlike Bloom (commit first,
        fill-check after, rebuild as a follow-up commit), the load check
        runs BEFORE the insert: a cuckoo insert near LOAD_FACTOR fails
        its kick walk outright instead of degrading gracefully, so a
        saturated filter must rebuild wider first — and the rebuilt
        blobs then ride the SAME commit as the batch (one snapshot, no
        extra namespace traffic). The pre-insert check is one 64-row agg
        over the committed blob table."""
        blobs = self.blobs()
        has_blobs = bool(
            head and head.tables.get(self.TABLE_CUCKOO, {}).get("rows", 0)
        )
        if has_blobs:
            nb = int(blobs.agg(F.max(F.length("blob"))).first()[0]) // 2 // BUCKET_SLOTS
        else:
            nb = self._initial_buckets
        info: dict = {"rebuilt": False, "n_buckets": nb}
        if has_blobs:
            load_max = float(
                cuckoo_load(blobs).agg(F.max("load")).first()[0] or 0.0
            )
            info["load_max_before"] = load_max
            if load_max > self.rebuild_fill:
                n_keys = self.seen().count()
                need = max(
                    nb * 2, n_keys // max(self.n_parts, 1) // BUCKET_SLOTS * 2
                )
                nb = 1 << (need - 1).bit_length()
                blobs = build_cuckoo(
                    self.seen().select(F.col(self.url_col).alias("url")),
                    n_parts=self.n_parts,
                    n_buckets=nb,
                )
                info.update(rebuilt=True, n_buckets=nb)
        out = insert_into_cuckoo(
            blobs,
            new_urls.select(F.col(self.url_col).alias("url")),
            n_parts=self.n_parts,
            n_buckets=nb,
        )
        try:
            man = self.store.commit(
                head.batch_id + 1 if head else 1,
                full_tables={self.TABLE_CUCKOO: out, **full_extra},
                delta_tables={self.TABLE_SEEN: new_urls},
                metrics={**(metrics or {}), self.METRIC_LOGICAL: bid},
                partition_cols=pcols,
            )
        except Exception as e:
            # the pre-insert load check sees the COMMITTED load, not the
            # incoming batch: a batch large relative to capacity (or the
            # very first commit into an undersized fresh filter) can
            # still fail its kick walk. store.commit staged to a tmp dir
            # and cleaned up, so nothing was written — rebuild sized for
            # seen+batch and retry once. This keeps the constructor's
            # "undersizing is safe" contract true for cuckoo too.
            if "over capacity" not in str(e):
                raise
            all_keys = self.seen().select(
                F.col(self.url_col).alias("url")
            ).unionByName(new_urls.select(F.col(self.url_col).alias("url")))
            n_keys = all_keys.count()
            need = max(nb * 2, n_keys // max(self.n_parts, 1) // BUCKET_SLOTS * 2)
            nb = 1 << (need - 1).bit_length()
            out = build_cuckoo(all_keys, n_parts=self.n_parts, n_buckets=nb)
            man = self.store.commit(
                head.batch_id + 1 if head else 1,
                full_tables={self.TABLE_CUCKOO: out, **full_extra},
                delta_tables={self.TABLE_SEEN: new_urls},
                metrics={
                    **(metrics or {}),
                    "event": "cuckoo_overflow_rebuild",
                    self.METRIC_LOGICAL: bid,
                },
                partition_cols=pcols,
            )
            info.update(rebuilt=True, n_buckets=nb, overflow_recovered=True)
        return man, info

    def delete_urls(
        self, urls: DataFrame, metrics: dict | None = None
    ) -> tuple[Manifest, dict]:
        """Remove URLs from the seen state (the drain-scale form of the
        reference's delete-source-cascades-to-pages,
        /root/reference/backend/service/services.py:317-324): append
        them to the ``url_deleted`` tombstone table — ``seen()`` and the
        bucket-wise ``anti_join`` subtract tombstones, so the URLs are
        immediately re-crawlable — and, with ``filter_kind='cuckoo'``,
        evict their fingerprints from the prefilter blobs so the maybe
        slice stays truthful WITHOUT a rebuild. (Bloom mode tombstones
        only: shared bits cannot be unset, so deleted URLs keep probing
        maybe_seen until the next width rebuild drops them — correct,
        since the exact tier resolves every maybe, just more maybe
        traffic.)

        Eviction safety: deletions are first deduplicated and
        restricted to CURRENTLY-SEEN urls. A cuckoo filter's deletion
        is only safe for keys that were actually inserted — evicting a
        key that is absent (never committed, tombstoned already, or a
        duplicate row in ``urls``) can remove a colliding fingerprint
        belonging to a DIFFERENT live url, and a prefilter false
        negative is the one error class the two-tier design cannot
        absorb (a definitely-new candidate skips the exact anti-join
        entirely and would be double-crawled). With the semi-join
        guard, two live urls sharing a (bucket, fingerprint) each own
        one inserted copy, so deleting one leaves the other's copy in
        place — the standard counting argument. Physical purge of the
        url_seen rows happens at ``apply_deletes``. This is an internal
        commit: it advances the store counter but NOT the logical batch
        id."""
        head = self.store.head()
        if head is None:
            raise ValueError("delete_urls: nothing committed yet")
        dels = (
            urls.select(F.col(self.url_col))
            .dropDuplicates([self.url_col])
            .join(self.seen().select(self.url_col), self.url_col, "left_semi")
        )
        pcols = None
        if self.bucketed_parts is not None:
            dels = dels.withColumn(self.BUCKET_COL, self._bucket_expr())
            pcols = {self.TABLE_DELETED: [self.BUCKET_COL]}
        full_tables: dict[str, DataFrame] = {}
        if self.filter_kind == "cuckoo" and head.tables.get(
            self.TABLE_CUCKOO, {}
        ).get("rows", 0):
            full_tables[self.TABLE_CUCKOO] = delete_from_cuckoo(
                self.blobs(),
                dels.select(F.col(self.url_col).alias("url")),
                n_parts=self.n_parts,
            )
        man = self.store.commit(
            head.batch_id + 1,
            full_tables=full_tables,
            delta_tables={self.TABLE_DELETED: dels},
            metrics={
                **(metrics or {}),
                "event": "delete_urls",
                self.METRIC_LOGICAL: self.last_logical(),
            },
            partition_cols=pcols,
        )
        return man, {"filter_evicted": self.filter_kind == "cuckoo"}

    def apply_deletes(self, n_files: int = 8) -> Manifest:
        """Physically purge tombstoned rows: rewrite url_seen as
        ``seen()`` (already tombstone-subtracted) and clear the
        tombstone table — the engine's compaction-cadence companion, so
        steady-state deletes cost an append + blob eviction and the
        O(|seen|) rewrite is paid on the same schedule as ``compact``."""
        head = self.store.head()
        if head is None:
            raise ValueError("apply_deletes: nothing committed yet")
        if not head.tables.get(self.TABLE_DELETED, {}).get("rows", 0):
            return head  # no tombstones pending: nothing to purge
        seen = self.seen()
        pcols = None
        if self.bucketed_parts is not None:
            # n_files tasks, each writing whole buckets => ~one file per
            # bucket (same bounding contract as store.compact)
            seen = seen.repartition(n_files, F.col(self.BUCKET_COL))
            pcols = {
                self.TABLE_SEEN: [self.BUCKET_COL],
                self.TABLE_DELETED: [self.BUCKET_COL],
            }
        else:
            seen = seen.coalesce(n_files)
        return self.store.commit(
            head.batch_id + 1,
            full_tables={
                self.TABLE_SEEN: seen,
                self.TABLE_DELETED: self.deleted().limit(0),
            },
            metrics={
                "event": "apply_deletes",
                self.METRIC_LOGICAL: self.last_logical(),
            },
            partition_cols=pcols,
        )

    def rebuild_filter(self) -> Manifest:
        """(Re)build the configured filter kind from the full seen set
        and commit it, clearing the OTHER kind's blob table — the
        explicit migration path between filter kinds (bloom <-> cuckoo)
        and the recovery path blobs() directs to. Internal commit (does
        not advance the logical batch id)."""
        head = self.store.head()
        if head is None:
            raise ValueError("rebuild_filter: nothing committed yet")
        seen = self.seen().select(F.col(self.url_col).alias("url"))
        n_keys = seen.count()
        if self.filter_kind == "cuckoo":
            need = max(
                self._initial_buckets,
                n_keys // max(self.n_parts, 1) // BUCKET_SLOTS * 2,
            )
            blobs = build_cuckoo(
                seen, n_parts=self.n_parts, n_buckets=1 << (max(need, 1) - 1).bit_length()
            )
        else:
            need = max(
                self._initial_m_bits,
                (n_keys * BITS_PER_KEY) // max(self.n_parts, 1),
            )
            blobs = build_bloom(
                seen, n_parts=self.n_parts, m_bits_per_part=1 << (need - 1).bit_length()
            )
        other = (
            self.TABLE_BLOOM if self.filter_kind == "cuckoo" else self.TABLE_CUCKOO
        )
        full: dict[str, DataFrame] = {self.filter_table: blobs}
        if head.tables.get(other, {}).get("rows", 0):
            full[other] = self.store.read(other).limit(0)
        return self.store.commit(
            head.batch_id + 1,
            full_tables=full,
            metrics={
                "event": "filter_rebuild",
                "filter_kind": self.filter_kind,
                self.METRIC_LOGICAL: self.last_logical(),
            },
        )

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
