"""make_frontier's dup_back contract (ADVICE r4): every batch >= 1 of a
micro-batched drain must re-discover GENUINELY EMITTED URLs — the 20%
cross-batch duplication pressure the loop benchmarks claim. The broken
shift-chain form (eff = id - dup_back) targeted URLs the previous batch
never emitted, so duplication existed only in batch 1 and was exactly 0
for every batch >= 2."""

import bench


def _urlset(spark, n, start, dup_back):
    return {
        r.url
        for r in bench.make_frontier(spark, n, start=start, dup_back=dup_back)
        .select("url")
        .collect()
    }


def test_dup_back_rediscovers_emitted_urls_in_every_batch(spark):
    B = 20_000
    batch0 = _urlset(spark, B, 0, B)
    emitted = set(batch0)
    for i in (1, 2, 3):
        bi = _urlset(spark, B, i * B, B)
        dups = bi & emitted
        # every 5th row (id%5==1) re-discovers a batch-0-family URL
        assert len(dups) == B // 5, f"batch {i}: {len(dups)} dups"
        assert dups <= batch0  # fixed-point family: always batch-0 URLs
        emitted |= bi


def test_dup_back_zero_reproduces_single_shot_frontier(spark):
    a = bench.make_frontier(spark, 5_000).select("url", "host", "seq", "priority")
    b = bench.make_frontier(spark, 5_000, start=0, dup_back=0).select(
        "url", "host", "seq", "priority"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
