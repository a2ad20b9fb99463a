"""Unit tests: repetition signals, redaction, deterministic sampling.

The oracle queries cover real-data parity; these pin edge cases the
synthetic corpus can't reach (PII strings, empty docs, nesting).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pgloader_spark.operators import text as txt
from pgloader_spark.operators.sampling import hash_sample, stratified_take


def _one(spark, s: str, col):
    return spark.createDataFrame([(s,)], "text string").select(
        col.alias("v")
    ).collect()[0]["v"]


def test_redact_email_url_digits(spark):
    s = "mail a@b.com or visit https://x.io/page?id=9 ref 1234567 end"
    got = _one(spark, s, txt.redact(F.col("text")))
    assert got == "mail <EMAIL> or visit <URL> ref <NUM> end"


def test_redact_keeps_short_digit_runs(spark):
    assert _one(spark, "call 12345 now", txt.redact(F.col("text"))) == "call 12345 now"


def test_normalize_collapses_whitespace_and_case(spark):
    got = _one(spark, "  A\t\tB\n C  ", txt.normalize_text(F.col("text")))
    assert got == "a b c"


def test_dup_ngram_fraction_values(spark):
    # "a b a b a" -> bigrams [a b, b a, a b, b a]: 4 total, 2 distinct
    got = _one(spark, "a b a b a", txt.dup_ngram_fraction("text", 2))
    assert got == 0.5
    assert _one(spark, "", txt.dup_ngram_fraction("text", 2)) == 0.0
    assert _one(spark, "one", txt.dup_ngram_fraction("text", 2)) == 0.0


def test_top_ngram_fraction(spark):
    # bigrams: [x y, y x, x y] -> top "x y" 2/3
    got = _one(spark, "x y x y", txt.top_ngram_fraction("text", 2))
    assert got == round(2 / 3, 6)


def test_token_entropy_uniform_and_constant(spark):
    assert _one(spark, "w w w w", txt.token_entropy("text")) == 0.0
    got = _one(spark, "a b c d", txt.token_entropy("text"))
    assert got == round(math.log(4), 6)


def test_hash_sample_is_nested_and_deterministic(spark):
    df = spark.range(0, 2000).select(F.col("id").alias("k"))
    s10 = {r["k"] for r in hash_sample(df, "k", 0.10, seed=3).collect()}
    s05 = {r["k"] for r in hash_sample(df, "k", 0.05, seed=3).collect()}
    again = {r["k"] for r in hash_sample(df, "k", 0.10, seed=3).collect()}
    assert s05 < s10  # nested subsets, same seed
    assert s10 == again  # rerun-stable
    assert 0.06 < len(s10) / 2000 < 0.14  # roughly the asked fraction


def test_stratified_take_exact_counts(spark):
    df = spark.range(0, 300).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("g")
    )
    out = stratified_take(df, "g", "id", 7)
    counts = out.groupBy("g").count().collect()
    assert {r["g"]: r["count"] for r in counts} == {"0": 7, "1": 7, "2": 7}
    # deterministic across invocations
    a = sorted(r["id"] for r in out.collect())
    b = sorted(r["id"] for r in stratified_take(df, "g", "id", 7).collect())
    assert a == b


def test_shuffle_shard_plan_is_a_deterministic_permutation(spark):
    """(shard, pos) must be a permutation: every id exactly once, pos
    dense 0..k-1 per shard; identical across reruns and partition
    layouts; a different seed gives a different order."""
    from pgloader_spark.operators.sampling import shuffle_shard_plan

    df = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    plan = shuffle_shard_plan(df, n_shards=7, seed=4, id_col="doc_id")
    rows = plan.collect()
    assert len(rows) == 1000
    assert len({r["doc_id"] for r in rows}) == 1000
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(7))
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), shard
    # rerun- and layout-stable
    again = shuffle_shard_plan(
        df.repartition(13), n_shards=7, seed=4, id_col="doc_id"
    ).collect()
    assert {(r["doc_id"], r["shard"], r["pos"]) for r in rows} == {
        (r["doc_id"], r["shard"], r["pos"]) for r in again
    }
    # another seed is an independent permutation
    other = shuffle_shard_plan(df, n_shards=7, seed=5, id_col="doc_id").collect()
    assert {(r["doc_id"], r["shard"], r["pos"]) for r in other} != {
        (r["doc_id"], r["shard"], r["pos"]) for r in rows
    }


def test_shuffle_shard_plan_prepartition_single_exchange(spark):
    """r7 review: with shard_partitions set (the export path), the
    position window must reuse the explicit repartition's clustering
    — exactly ONE Exchange in the plan, and the mapping is identical
    to the default path."""
    import re

    from pgloader_spark.operators.sampling import shuffle_shard_plan

    df = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    pre = shuffle_shard_plan(df, 5, seed=2, shard_partitions=5)
    je = pre._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = je.explainString(mode)
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    base = shuffle_shard_plan(df, 5, seed=2)
    assert {(r["doc_id"], r["shard"], r["pos"]) for r in pre.collect()} == {
        (r["doc_id"], r["shard"], r["pos"]) for r in base.collect()
    }


def test_export_shuffled_writes_ordered_shards(spark, tmp_path):
    import glob
    import gzip
    import json as _json

    from pgloader_spark.operators.sampling import shuffle_shard_plan
    from pgloader_spark.sinks.writers import export_shuffled

    df = spark.range(0, 200).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2).alias("v")
    )
    out = str(tmp_path / "export")
    export_shuffled(df, out, n_shards=4, seed=9)
    plan = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in shuffle_shard_plan(df, 4, seed=9).collect()
    }
    seen = 0
    for shard in range(4):
        recs = []
        for f in sorted(glob.glob(f"{out}/shard={shard}/*.json.gz")):
            with gzip.open(f, "rt") as fh:
                recs += [_json.loads(line) for line in fh]
        # file order IS pos order, and matches the registered plan
        assert [r["pos"] for r in recs] == sorted(r["pos"] for r in recs)
        for r in recs:
            assert plan[r["doc_id"]] == (shard, r["pos"])
            assert r["v"] == r["doc_id"] * 2  # payload columns ride along
        seen += len(recs)
    assert seen == 200


def test_weighted_hash_sample_matches_reference_and_is_stable(spark):
    """A-ES selection must equal the top-k of the exact per-row keys
    (independent Python recompute), exclude non-positive weights, and
    be layout-stable."""
    import hashlib
    import math as _math

    from pgloader_spark.operators.sampling import weighted_hash_sample

    rows = [(i, float(1 + (i * 7) % 50)) for i in range(500)]
    rows += [(900, 0.0), (901, -3.0), (902, None)]  # excluded
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = weighted_hash_sample(df, "w", k=40, seed=5, id_col="doc_id").collect()
    assert len(got) == 40
    assert {r["doc_id"] for r in got}.isdisjoint({900, 901, 902})

    def key(i, w):
        h = int(hashlib.md5(f"5:{i}".encode()).hexdigest()[:12], 16)
        return round(w / _math.log((h + 1) / float((1 << 48) + 1)), 6)

    expect = sorted(
        ((key(i, w), i) for i, w in rows[:500]), key=lambda t: (t[0], t[1])
    )[:40]
    assert [(r["sample_key"], r["doc_id"]) for r in got] == expect
    # layout-stable
    again = weighted_hash_sample(
        df.repartition(17), "w", k=40, seed=5, id_col="doc_id"
    ).collect()
    assert {(r["doc_id"], r["sample_key"]) for r in again} == {
        (r["doc_id"], r["sample_key"]) for r in got
    }
    # heavier rows win more often: mean selected weight > corpus mean
    mean_sel = sum(r["weight"] for r in got) / len(got)
    mean_all = sum(w for _, w in rows[:500]) / 500
    assert mean_sel > mean_all


def test_weighted_hash_sample_large_weights_keep_key_spread(spark):
    """r7 review regression: with weights ~1e7 the old ln(u)/w key
    rounded to a handful of values and the sample degenerated into
    lowest-id selection; the reciprocal w/ln(u) key must keep the
    keys distinct and the selection hash-driven, not id-driven."""
    from pgloader_spark.operators.sampling import weighted_hash_sample

    df = spark.createDataFrame(
        [(i, 1.0e7 + (i % 97)) for i in range(400)], "doc_id long, w double"
    )
    got = weighted_hash_sample(df, "w", k=50, seed=5, id_col="doc_id").collect()
    keys = [r["sample_key"] for r in got]
    assert len(set(keys)) == len(keys), "keys must not collapse under rounding"
    ids = sorted(r["doc_id"] for r in got)
    assert ids != list(range(50)), "selection must not be lowest-id"


def test_snapshot_diff_all_statuses(spark):
    from pgloader_spark.plans.corpus import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B2"), (4, "d")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_tfidf_topk_basic(spark):
    df = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "cherry date date")],
        "doc_id long, text string",
    )
    rows = txt.tfidf_topk(df, k=1).collect()
    best = {r["doc_id"]: r["term"] for r in rows}
    # each doc's top term is its repeated/unique word
    assert best == {1: "apple", 2: "banana", 3: "date"}


def test_ivf_kmeans_refines_and_keeps_k(spark):
    import math

    from pgloader_spark.operators.similarity import (
        ivf_centroids,
        ivf_centroids_kmeans,
    )

    # two tight clusters around (1,0) and (0,1); first-2 seeding picks
    # two near-identical vectors from cluster A — Lloyd must move one
    rows = [
        (0, [1.0, 0.01]), (1, [1.0, 0.02]), (2, [0.9, 0.0]), (3, [1.1, 0.05]),
        (4, [0.01, 1.0]), (5, [0.02, 1.0]), (6, [0.0, 0.9]), (7, [0.05, 1.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    seeds = ivf_centroids(df, 2)
    refined = ivf_centroids_kmeans(df, 2, n_iters=2)
    assert len(refined) == 2 and [c for c, _ in refined] == [0, 1]
    assert all(len(v) == 2 for _, v in refined)
    # seeds both point along x; refined centroids must separate: one
    # near x-axis, one near y-axis
    def angle(v):
        return math.atan2(v[1], v[0])
    seed_spread = abs(angle(seeds[0][1]) - angle(seeds[1][1]))
    refined_spread = abs(angle(refined[0][1]) - angle(refined[1][1]))
    assert refined_spread > seed_spread
    assert refined_spread > 1.0  # ~90 degrees apart


def test_dup_span_stats_planted_substring(spark):
    """ExactSubstr-style spans: a 20-token verbatim run shared by two
    otherwise-different documents is flagged in both; a unique doc
    has dup_frac 0."""
    from pgloader_spark.operators.dedup import dup_span_stats

    shared = " ".join(f"tok{i}" for i in range(25))
    rows = [
        (1, "alpha begins here " + shared + " alpha ends here"),
        (2, "totally different opening " + shared + " different closing"),
        (3, " ".join(f"uniq{i}" for i in range(40))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["id"]: r for r in dup_span_stats(df, w=20).collect()
    }
    assert out[3]["n_dup_windows"] == 0 and out[3]["dup_frac"] == 0.0
    # both docs sharing the 25-token run have >= 6 shared windows
    # (25 - 20 + 1), and some non-shared windows too
    for d in (1, 2):
        assert out[d]["n_dup_windows"] >= 6
        assert 0 < out[d]["dup_frac"] < 1


def test_c4_line_clean_rules(spark):
    """The full C4 rule set on crafted lines: terminal punctuation,
    min words, javascript/code markers, lorem-ipsum doc drop."""
    from pgloader_spark.operators.text import c4_line_clean

    good = "this is a good long sentence."
    docs = [
        (1, f"{good}\n{good}\n{good}"),                      # kept
        (2, "too short.\nno punct at all here\nx { code }"), # all lines die
        (3, f"{good}\nthis line mentions javascript sadly.\n{good}\n{good}"),
        (4, f"lorem ipsum dolor sit amet.\n{good}\n{good}"), # doc dropped
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = {r.doc_id: r for r in c4_line_clean(df).collect()}
    assert out[1].n_kept == 3 and out[1].keep_doc is True
    assert out[2].n_kept == 0 and out[2].keep_doc is False
    assert out[3].n_kept == 3  # the javascript line filtered out of 4
    assert out[4].keep_doc is False  # lorem ipsum kills the doc
    assert out[1].cleaned_len == 3 * len("this is a good long sentence.") + 2


def test_dup_span_remove_string_ids_and_canonical(spark):
    """dup_span_remove must work with STRING doc ids (round-3 advice:
    the numeric id*2^20+pos packing cast-crashed on strings) and keep
    exactly one canonical copy of each duplicated span."""
    from pgloader_spark.operators.dedup import dup_span_remove

    span = " ".join(f"w{i}" for i in range(6))  # 6-token window, w=6
    rows = [
        ("doc-a", span + " " + "uniq1 uniq2 uniq3"),
        ("doc-b", "pre1 pre2 " + span),
        ("doc-c", "only unique tokens here nothing shared"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {
        r["id"]: r
        for r in dup_span_remove(df, w=6).collect()
    }
    # canonical occurrence = lowest (id, pos): doc-a keeps the span
    assert out["doc-a"]["n_removed"] == 0
    assert out["doc-b"]["n_removed"] == 6   # its copy is stripped
    assert out["doc-c"]["n_removed"] == 0
    # huge numeric-looking ids (>= 2^43, the old packing overflow) work
    big = spark.createDataFrame(
        [(2**60, span), (2**60 + 1, span)], "doc_id long, text string"
    )
    got = {r["id"]: r["n_removed"] for r in dup_span_remove(big, w=6).collect()}
    assert got == {2**60: 0, 2**60 + 1: 6}


def test_semantic_decontaminate_drops_near_eval_vectors(spark):
    """Planted contamination: an exact copy and a near-copy of an eval
    vector drop; an orthogonal vector survives; empty eval set is a
    no-op."""
    from pgloader_spark.operators.decontam import semantic_decontaminate

    ev = spark.createDataFrame(
        [(1000, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),       # exact copy -> drop
            (2, [0.99, 0.1, 0.0, 0.0]),      # near copy -> drop
            (3, [0.0, 0.0, 1.0, 0.0]),       # orthogonal -> keep
            (4, [0.0, 0.0, 0.0, 0.0]),       # zero vector -> keep (nan cos)
        ],
        "vec_id long, embedding array<double>",
    )
    kept = {r["vec_id"]
            for r in semantic_decontaminate(corpus, ev, tau=0.9).collect()}
    assert kept == {3, 4}
    # empty eval set: everything survives
    kept_all = {r["vec_id"] for r in semantic_decontaminate(
        corpus, ev.filter("vec_id < 0"), tau=0.9).collect()}
    assert kept_all == {1, 2, 3, 4}


def test_bm25_topk_matches_reference_math(spark):
    corpus = [
        (1, "apple banana apple kiwi"),
        (2, "banana cherry cherry"),
        (3, "cherry date date date"),
        (4, "kiwi kiwi melon"),
        (5, "plum plum plum"),  # shares no query term -> never scored
    ]
    queries = [(10, "apple cherry"), (20, "kiwi")]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    qdf = spark.createDataFrame(queries, "query_id long, query_text string")
    out = txt.bm25_topk(docs, qdf, k=3).collect()

    # independent plain-Python BM25 on the same tokenization
    import math

    toks = {d: t.split() for d, t in corpus}
    dl = {d: len(t) for d, t in toks.items()}
    n, avgdl = len(dl), sum(dl.values()) / len(dl)
    k1, b = 1.2, 0.75

    def score(q, d):
        s = 0.0
        for term in dict.fromkeys(q.split()):
            tf = toks[d].count(term)
            if not tf:
                continue
            df = sum(term in t for t in toks.values())
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl[d] / avgdl))
        return round(s, 6)

    expect = {}
    for qid, q in queries:
        cand = [(d, score(q, d)) for d in toks if score(q, d) > 0]
        cand.sort(key=lambda p: (-p[1], p[0]))
        for rnk, (d, s) in enumerate(cand[:3], 1):
            expect[(qid, d)] = (s, rnk)

    got = {(r["query_id"], r["doc_id"]): (r["score"], r["rnk"]) for r in out}
    assert got == expect
    assert all(d != 5 for _, d in got)  # posting-list pruning held


def _bpe_reference(texts, n_merges, min_pair_count=2):
    """Textbook in-memory BPE (Sennrich 2016 get_stats/merge_vocab)."""
    import re
    from collections import Counter

    words = Counter(
        t for s in texts for t in re.split(r"[^a-z0-9]+", s.lower()) if t
    )
    vocab = {}
    for w, c in words.items():
        syms = list(w[:-1]) + [w[-1] + "</w>"]
        vocab[tuple(syms)] = vocab.get(tuple(syms), 0) + c
    merges = []
    for rank in range(1, n_merges + 1):
        stats = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += c
        if not stats:
            break
        (l, r), pc = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        if pc < min_pair_count:
            break
        merges.append((rank, l, r, l + r, pc))
        new = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + c
        vocab = new
    return merges


def test_bpe_learn_matches_textbook_reference(spark):
    import random

    rng = random.Random(7)
    vocab_words = ["lower", "lowest", "newer", "newest", "wider", "low", "new"]
    texts = [
        " ".join(rng.choice(vocab_words) for _ in range(rng.randint(3, 12)))
        for _ in range(40)
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = txt.bpe_learn(df, n_merges=12)
    want = _bpe_reference(texts, 12)
    assert got == want
    # partition-invariance: same merges from a different layout
    got8 = txt.bpe_learn(df.repartition(8), n_merges=12)
    assert got8 == want


def test_bpe_learn_1000_merges_matches_textbook(spark):
    """Deep-merge parity: 1000 merge rounds over a diverse corpus,
    byte-identical to the recount-everything textbook loop — AND fast
    (the incremental trainer costs one Spark job total; the per-merge
    work is delta-sized, so 1k merges take seconds, not minutes)."""
    import random
    import time

    rng = random.Random(42)
    vocab_words = [
        "".join(rng.choice("abcdefghij") for _ in range(rng.randint(3, 12)))
        for _ in range(600)
    ]
    texts = [
        " ".join(rng.choice(vocab_words) for _ in range(20))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    t0 = time.monotonic()
    got = txt.bpe_learn(df, n_merges=1000)
    elapsed = time.monotonic() - t0
    want = _bpe_reference(texts, 1000)
    assert got == want
    assert len(got) > 500  # the corpus genuinely sustains deep merges
    assert elapsed < 60, f"1000 merges took {elapsed:.1f}s"


def test_bpe_learn_max_vocab_caps_driver_table(spark):
    """max_vocab keeps only the top-N words by (count DESC, word
    ASC); merges equal training on exactly that truncated table."""
    texts = ["aa bb aa cc aa bb", "aa bb dd"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    # full: aa=4 bb=3 cc=1 dd=1; cap at 2 -> only aa, bb survive
    capped = txt.bpe_learn(df, n_merges=5, max_vocab=2)
    want = txt.bpe_train_from_freqs({"aa": 4, "bb": 3}, 5)
    assert capped == want


def test_bpe_learn_stops_when_no_repeating_pair(spark):
    df = spark.createDataFrame([("ab cd",)], "text string")
    # every pair occurs once -> stops immediately with min_pair_count=2
    assert txt.bpe_learn(df, n_merges=5) == []


def test_bpe_segment_counts_matches_textbook_segmenter(spark):
    import random
    import re

    rng = random.Random(11)
    vocab_words = ["lower", "lowest", "newer", "newest", "wide", "widest"]
    corpus = [
        (i, " ".join(rng.choice(vocab_words) for _ in range(rng.randint(2, 9))))
        for i in range(25)
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    merges = txt.bpe_learn(df, n_merges=10)
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_subwords"], r["subwords_per_token"])
        for r in txt.bpe_segment_counts(df, merges).collect()
    }

    def segment(word):
        syms = list(word[:-1]) + [word[-1] + "</w>"]
        for _rank, l, r, m, _pc in merges:
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    res.append(m)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        return syms

    for doc_id, text in corpus:
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        n_sub = sum(len(segment(t)) for t in toks)
        assert out[doc_id] == (
            len(toks),
            n_sub,
            round(n_sub / len(toks), 6),
        ), doc_id


def test_bpe_segment_counts_adversarial_repeats(spark):
    """The replace-chain segmenter (r10: per-rank greedy pass compiled
    to one non-overlapping delimited-string replace) must match the
    textbook scan on the shapes where naive rewrites diverge: runs of
    identical symbols ('aaaa' under a,a->aa merges exactly twice, not
    cascading), merges whose output is the left symbol of a later
    rule, and single-char words (pure '</w>' symbol)."""
    docs = spark.createDataFrame(
        [(1, "aaaa aaa aa a"), (2, "abab abc bab"), (3, "a b ab ba")],
        "doc_id long, text string",
    )
    merges = [
        (1, "a", "a", "aa", 99),
        (2, "aa", "aa", "aaaa", 98),
        (3, "a", "b", "ab", 97),
        (4, "ab", "a", "aba", 96),
        (5, "b", "</w>", "b</w>", 95),
        (6, "ab", "b</w>", "abb</w>", 94),
    ]

    def segment(word):
        syms = list(word[:-1]) + [word[-1] + "</w>"]
        for _rank, left, right, m, _pc in merges:
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    res.append(m)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        return syms

    out = {
        r["doc_id"]: (r["n_tokens"], r["n_subwords"])
        for r in txt.bpe_segment_counts(docs, merges).collect()
    }
    for doc_id, text in [(1, "aaaa aaa aa a"), (2, "abab abc bab"), (3, "a b ab ba")]:
        toks = text.split()
        want = (len(toks), sum(len(segment(t)) for t in toks))
        assert out[doc_id] == want, (doc_id, out[doc_id], want)


def test_new_text_ops_tolerate_null_and_empty_text(spark):
    """NULL/empty documents must not crash BM25, BPE, or the corpus
    card — they contribute no tokens and drop out of token-keyed
    outputs (production corpora always carry some broken rows)."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha", "en", "s0"),
            (2, None, "en", "s0"),
            (3, "", "fr", "s1"),
            (4, "beta gamma", "en", "s1"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    qdf = spark.createDataFrame(
        [(1, "alpha")], "query_id long, query_text string"
    )
    bm = txt.bm25_topk(docs, qdf, k=5).collect()
    assert {r["doc_id"] for r in bm} == {1}  # only the alpha doc scores

    merges = txt.bpe_learn(docs, n_merges=4)
    assert merges  # learned from the non-null rows only
    seg = {r["doc_id"]: r["n_tokens"] for r in
           txt.bpe_segment_counts(docs, merges).collect()}
    assert seg == {1: 3, 4: 2}  # null/empty docs emit no token rows


def test_gopher_rules_each_rule_fires(spark):
    from pgloader_spark.operators.text import gopher_quality_rules

    good = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away to find some more food for the day") * 1
    docs = [
        (1, good),                                   # passes everything
        (2, "short text"),                           # word count
        (3, " ".join(["a"] * 30)),                   # mean word len low (+alpha ok)
        (4, " ".join(["12345"] * 30)),               # alpha + stopwords
        (5, good + " ###### ## # # # ## # # # #"),   # symbol ratio
        (6, "\n".join(["- the item is here ok"] * 10)),   # bullet lines
        (7, "\n".join(["we keep going and on..."] * 10)),  # ellipsis lines
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r["doc_id"]: r.asDict() for r in gopher_quality_rules(df).collect()}
    assert rows[1]["keep"] is True
    assert rows[2]["rule_word_count"] is False and rows[2]["keep"] is False
    assert rows[3]["rule_mean_word_len"] is False
    assert rows[4]["rule_alpha_words"] is False
    assert rows[4]["rule_stopwords"] is False
    assert rows[5]["rule_symbol_ratio"] is False
    assert rows[6]["rule_bullet_lines"] is False
    assert rows[7]["rule_ellipsis_lines"] is False


def test_gopher_rules_plan_is_narrow(spark):
    from pgloader_spark.operators.text import gopher_quality_rules

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = gopher_quality_rules(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # scan-speed: no shuffle anywhere


def test_token_budget_take_prefix_semantics(spark):
    from pgloader_spark.operators.sampling import token_budget_take

    rows = [
        # (id, tokens, score)
        (1, 100, 0.95),
        (2, 200, 0.90),
        (3, 150, 0.90),   # ties with 2: id tiebreak puts 2 first
        (4, 400, 0.50),
        (5, 100, 0.10),
        (6, 0, 0.99),     # zero-token: excluded by contract
    ]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long, score double")

    def take(budget):
        got = token_budget_take(df, budget=budget).orderBy("cum_tokens").collect()
        return [(r.doc_id, r.cum_tokens) for r in got]

    assert take(449) == [(1, 100), (2, 300)]          # 3 would cross
    assert take(450) == [(1, 100), (2, 300), (3, 450)]  # exact fit
    assert take(99) == []                              # top doc alone too big
    assert take(0) == []
    assert take(10_000) == [(1, 100), (2, 300), (3, 450), (4, 850), (5, 950)]


def test_token_budget_take_matches_global_sort_on_random(spark):
    """Bucket decomposition == a plain global cumsum prefix, on
    randomized scores/token counts (the boundary-bucket edge cases a
    hand-picked fixture misses)."""
    import random

    rng = random.Random(99)
    rows = [
        (i, rng.randint(1, 50), round(rng.random(), 6)) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long, score double")
    budget = 3000
    from pgloader_spark.operators.sampling import token_budget_take

    got = {
        r.doc_id: r.cum_tokens
        for r in token_budget_take(df, budget=budget).collect()
    }
    ordered = sorted(rows, key=lambda r: (-r[2], r[0]))
    cum, want = 0, {}
    for i, t, _s in ordered:
        if cum + t > budget:
            break
        cum += t
        want[i] = cum
    assert got == want


def test_token_budget_take_null_nan_scores_excluded(spark):
    """r5 advice: a null or NaN score must neither crash the driver
    bucket resolution (sorted() on None raised TypeError) nor be
    admitted against the budget."""
    from pgloader_spark.operators.sampling import token_budget_take

    rows = [
        (1, 10, 0.9),
        (2, 10, float("nan")),
        (3, 10, None),
        (4, 10, 0.8),
        (5, 10, 0.7),
    ]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long, score double")
    got = token_budget_take(df, budget=25).orderBy("cum_tokens").collect()
    assert [(r.doc_id, r.cum_tokens) for r in got] == [(1, 10), (4, 20)]


def test_frozen_models_deterministic_and_partition_invariant(spark, sf_dir):
    """r9 gate variants: the frozen-model queries must be bit-stable
    under partitioning (the driver's hash compares them to a static
    oracle, so ANY layout sensitivity is a red row waiting to happen).
    Integer-exact arithmetic + full tie-breaks make them invariant by
    construction; this pins it."""
    from pgloader_spark.frozen_models import (
        BPE_MERGES,
        IVFPQ_CODEBOOKS,
        IVFPQ_COARSE,
    )
    from pgloader_spark.queries import QUERIES

    # the committed artifacts are well-formed
    assert len(IVFPQ_COARSE) == 8 and all(len(c) == 64 for c in IVFPQ_COARSE)
    assert len(IVFPQ_CODEBOOKS) == 16
    assert all(len(cb) == 64 and len(cb[0]) == 4 for cb in IVFPQ_CODEBOOKS)
    assert all(
        isinstance(v, int) for cb in IVFPQ_CODEBOOKS for c in cb for v in c
    )
    assert len(BPE_MERGES) == 24
    for rank, left, right, merged, cnt in BPE_MERGES:
        assert merged == left + right and cnt >= 2

    for name in ("similarity_ivfpq_frozen_topk", "text_bpe_frozen_segment"):
        base = sorted(map(tuple, QUERIES[name](spark, sf_dir).collect()))
        n = spark.sparkContext.defaultParallelism
        try:
            # skew the session's layout: a different shuffle width must
            # not change a single value
            spark.conf.set("spark.sql.shuffle.partitions", "7")
            again = sorted(map(tuple, QUERIES[name](spark, sf_dir).collect()))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", str(n * 2))
        assert base == again, f"{name} is partition-sensitive"
