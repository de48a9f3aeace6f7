"""MinHash-LSH near-dup dedup end-to-end (the 100 TB blocking shape):
band buckets find planted near-dup pairs that consecutive-id (linear)
blocking cannot see, and the exact-Jaccard verify gates them."""

from crawler_spark.queries import (
    _LSH_JAC_MIN,
    _LSH_OFFSET,
    q_dedup_minhash_lsh,
    q_dedup_ngram_jaccard,
)

SF = "/root/testdata/sf0.001"


def test_lsh_catches_planted_nondups_linear_blocking_misses(spark):
    out = {r.dup_doc_id: r for r in q_dedup_minhash_lsh(spark, SF).collect()}

    # planted mutations live at doc_id + _LSH_OFFSET for every 10th doc —
    # the pair (d, d + 1_000_000) is never consecutive, so the linear
    # q_dedup_ngram_jaccard blocking cannot emit it by construction
    linear_pairs = {
        (r.doc_a, r.doc_b) for r in q_dedup_ngram_jaccard(spark, SF).collect()
    }
    assert all(b - a == 1 for a, b in linear_pairs)

    planted = [d for d in out if d >= _LSH_OFFSET]
    assert planted, "no planted near-dup recovered"
    # every recovered planted dup resolves to a keeper no later than its
    # origin doc (keep-min may pick an even earlier ORGANIC duplicate of
    # the origin — that is the dedup semantics working, not a miss) and
    # passed the exact-Jaccard verify
    for dup in planted:
        r = out[dup]
        assert r.keep_doc_id <= dup - _LSH_OFFSET
        assert r.jac_milli >= _LSH_JAC_MIN

    # recall over the planted set: one appended token rarely perturbs any
    # of the 4 minhashes, so nearly all planted pairs must band-collide
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_planted = docs.filter("doc_id % 10 = 0").count()
    assert len(planted) >= 0.9 * n_planted
