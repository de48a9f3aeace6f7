"""Composed curation pipeline (crawler_spark/pipeline.py): every stage's
planted fixture is constructed to fire IN COMPOSITION — chrome that must
strip before dedup can catch anything, a near-dup that survives quality,
a span-mosaic that only the exposure filter catches, a token budget that
forces the mix to drop docs — and every boundary is checked against
pure-Python recomputation (md5/hash order included), so the glue between
the individually-proven operators is what this file pins."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from crawler_spark.pipeline import PIPELINE_STAGES, curate_corpus

CHROME = "nav home about contact hosta"


def _body(i: int, n: int) -> str:
    """n-token English-passing body: unique words + the/is stopword mix."""
    toks = []
    for j in range(n):
        if j % 5 == 0:
            toks.append("the")
        elif j % 7 == 3:
            toks.append("is")
        else:
            toks.append(f"w{i}x{j}")
    return " ".join(toks)


@pytest.fixture(scope="module")
def corpus_rows():
    rows = []  # (doc_id, host, lang, text)
    # host A: 5 chrome-prefixed good docs + 1 chrome-prefixed short doc.
    for i in range(5):
        rows.append((i, "hosta", "en", f"{CHROME} {_body(i, 25)}"))
    rows.append((5, "hosta", "en", f"{CHROME} {_body(5, 10)}"))  # too_short after strip
    # host B: a near-dup pair (one appended token) + 2 plain docs -> the
    # pair's shared blocks sit at 50% < the 60% boilerplate threshold.
    t10 = _body(10, 30)
    rows.append((10, "hostb", "en", t10))
    rows.append((11, "hostb", "en", t10 + " zz"))  # LSH dup of 10
    rows.append((12, "hostb", "en", _body(12, 30)))
    rows.append((13, "hostb", "en", _body(13, 30)))
    # host C: a span MOSAIC (first 15 tokens of doc 21 + first 15 of 22):
    # Jaccard vs either source ~0.30 -> survives LSH; but 16 of its 23
    # 8-token windows are cross-doc duplicated -> dup_milli ~696 > 500.
    # 2 filler docs keep the shared blocks under the boilerplate threshold.
    t21, t22 = _body(21, 30), _body(22, 30)
    mosaic = " ".join(t21.split()[:15] + t22.split()[:15])
    rows.append((20, "hostc", "fr", mosaic))
    rows.append((21, "hostc", "fr", t21))
    rows.append((22, "hostc", "fr", t22))
    rows.append((23, "hostc", "fr", _body(23, 30)))
    rows.append((24, "hostc", "fr", _body(24, 30)))
    return rows


MIX_BUDGET = 200  # tokens — forces the mix to drop docs on every host


@pytest.fixture(scope="module")
def stages(spark, corpus_rows):
    docs = spark.createDataFrame(
        corpus_rows, "doc_id long, host string, lang string, text string"
    )
    def _cb(name, df):
        # localCheckpoint both materializes the stage AND truncates the
        # logical plan — the composed 7-stage lineage (with LSH self-joins
        # doubling the subtree per reference) otherwise grows a plan tree
        # big enough to OOM the driver's plan printer. Same treatment the
        # engine's iterative operators use (queries_scale label
        # propagation / HITS).
        return df.localCheckpoint(eager=True)

    out = curate_corpus(docs, mix_budget=MIX_BUDGET, stage_cb=_cb)
    yield {name: df.collect() for name, df in out.items()}


def test_stage_names_cover_the_pipeline(stages):
    assert tuple(stages) == PIPELINE_STAGES


def test_boilerplate_strip_removes_chrome_only_on_hosta(stages, corpus_rows):
    by_id = {r["doc_id"]: r for r in stages["boilerplate_strip"]}
    raw = {d: t for d, _h, _l, t in corpus_rows}
    for i in range(6):  # chrome gone, body intact, lang carried
        assert by_id[i]["text"] == raw[i][len(CHROME) + 1 :]
        assert by_id[i]["lang"] == "en"
    for d in (10, 11, 12, 13, 20, 21, 22, 23, 24):  # no strip off-host
        assert by_id[d]["text"] == raw[d]
    assert all(r["n_tokens"] == len(r["text"].split()) for r in by_id.values())


def test_quality_gate_runs_on_cleaned_text(stages):
    ids = {r["doc_id"] for r in stages["quality_filter"]}
    assert 5 not in ids  # 10 tokens AFTER strip < 20 -> too_short
    assert ids == {0, 1, 2, 3, 4, 10, 11, 12, 13, 20, 21, 22, 23, 24}


def test_lsh_dedup_drops_the_near_dup_keep_min(stages):
    ids = {r["doc_id"] for r in stages["dedup_minhash_lsh"]}
    assert 11 not in ids and 10 in ids
    assert ids == {0, 1, 2, 3, 4, 10, 12, 13, 20, 21, 22, 23, 24}


def test_span_exposure_drops_the_mosaic_not_its_sources(stages):
    ids = {r["doc_id"] for r in stages["dup_span_filter"]}
    # mosaic: 16/23 windows duplicated (695 milli) > 500 -> dropped;
    # sources: 8/23 (347 milli) each -> kept.
    assert 20 not in ids
    assert {21, 22} <= ids
    assert ids == {0, 1, 2, 3, 4, 10, 12, 13, 21, 22, 23, 24}


def _mix_order_key(doc_id: int) -> str:
    return hashlib.md5(f"mix0#{doc_id}".encode()).hexdigest()


def test_domain_mix_is_the_hash_ordered_quota_prefix(stages):
    survivors = {r["doc_id"]: r for r in stages["dup_span_filter"]}
    mixed = stages["domain_mix"]
    picked_tokens = {}
    for r in mixed:
        picked_tokens.setdefault(r["host"], []).append(r["tokens"])
    # recompute quotas: isqrt(tokens) weights, Hamilton over MIX_BUDGET
    by_host = {}
    for r in survivors.values():
        by_host.setdefault(r["host"], []).append(r)
    weights = {h: math.isqrt(sum(x["n_tokens"] for x in v)) for h, v in by_host.items()}
    total_w = sum(weights.values())
    base = {h: (MIX_BUDGET * w) // total_w for h, w in weights.items()}
    rem = {h: (MIX_BUDGET * w) % total_w for h, w in weights.items()}
    leftover = MIX_BUDGET - sum(base.values())
    for h in sorted(rem, key=lambda h: (-rem[h], h))[:leftover]:
        base[h] += 1
    assert sum(base.values()) == MIX_BUDGET
    # per host: the mix keeps exactly the hash-ordered prefix under quota
    picked_ids = {h: set() for h in by_host}
    for r in mixed:
        picked_ids[r["host"]].add(r["doc_id"])
    for h, docs in by_host.items():
        order = sorted(docs, key=lambda r: (_mix_order_key(r["doc_id"]), r["doc_id"]))
        cum, expect = 0, set()
        for r in order:
            cum += r["n_tokens"]
            if cum <= base[h]:
                expect.add(r["doc_id"])
        assert picked_ids.get(h, set()) == expect, f"host {h}"
        assert sum(picked_tokens.get(h, [])) <= base[h]
    # the budget is binding: at least one host dropped at least one doc
    assert sum(len(v) for v in picked_ids.values()) < len(survivors)


def test_token_pack_offsets_are_per_lang_prefix_sums(stages):
    mixed = {r["doc_id"]: r for r in stages["domain_mix"]}
    packed = sorted(stages["token_pack"], key=lambda r: (r["lang"], r["doc_id"]))
    assert {r["doc_id"] for r in packed} == set(mixed)
    offsets = {}
    for r in packed:
        assert r["offset"] == offsets.get(r["lang"], 0)
        assert r["tokens"] == mixed[r["doc_id"]]["tokens"]
        assert r["chunk_first"] == r["offset"] // 512
        offsets[r["lang"]] = r["offset"] + r["tokens"]


def test_shard_shuffle_is_a_complete_deterministic_deal(stages):
    mixed = {r["doc_id"]: r for r in stages["domain_mix"]}
    shards = stages["shard_shuffle"]
    assert {r["doc_id"] for r in shards} == set(mixed)
    by_shard = {}
    for r in shards:
        hv = int(hashlib.md5(f"epoch0#{r['doc_id']}".encode()).hexdigest()[:15], 16)
        assert r["shard_id"] == hv % 8
        by_shard.setdefault(r["shard_id"], []).append((hv, r))
    for rows in by_shard.values():
        rows.sort(key=lambda t: (t[0], t[1]["doc_id"]))
        off = 0
        for pos0, (_hv, r) in enumerate(rows):
            assert r["pos"] == pos0 + 1
            assert r["shard_offset"] == off
            off += r["tokens"]
