"""Language-model-filter and split operators: bigram perplexity proxy,
hashed linear classifier inference, leakage-safe splitting.

Mirrors the reference's test strategy (unit semantics + property
checks) plus the plan contracts that are this repo's scale insurance.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from pgloader_spark.operators.sampling import leakage_safe_split
from pgloader_spark.operators.text import bigram_logprob, bigram_stream, hashed_linear_score

FLUENT = "the cat sat on the mat and the cat saw the mat"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bigram_stream_shape(spark):
    df = _docs(spark, [(1, "a b c"), (2, "solo"), (3, ""), (4, None)])
    got = {
        (r.doc_id, r.prev, r.cur)
        for r in bigram_stream(df).collect()
    }
    assert got == {(1, "a", "b"), (1, "b", "c")}


def test_bigram_logprob_fluent_beats_scrambled(spark):
    # ten fluent docs make "the cat"/"cat sat"/... high-count
    # transitions; the scrambled doc reuses the SAME unigrams in an
    # order the corpus never repeats, so every transition backs off to
    # the unseen mass and its mean log-prob collapses.
    rows = [(i, FLUENT) for i in range(10)]
    rows.append((99, "mat the on cat sat mat the saw and cat the"))
    out = {r.doc_id: r.avg_bigram_logprob for r in bigram_logprob(_docs(spark, rows)).collect()}
    assert out[0] == out[9]
    assert out[0] > out[99] + 1.0


def test_bigram_logprob_short_docs_zero(spark):
    df = _docs(spark, [(1, "one"), (2, ""), (3, None), (4, "a b a b")])
    out = {r.doc_id: (r.n_bigrams, r.avg_bigram_logprob) for r in bigram_logprob(df).collect()}
    assert out[1] == (0, 0.0)
    assert out[2] == (0, 0.0)
    assert out[3] == (0, 0.0)
    assert out[4][0] == 3


def test_bigram_logprob_partition_invariant(spark):
    rows = [(i, FLUENT if i % 3 else "alpha beta gamma delta alpha beta") for i in range(40)]
    df = _docs(spark, rows)
    a = sorted(map(tuple, bigram_logprob(df).collect()))
    b = sorted(map(tuple, bigram_logprob(df.repartition(7)).collect()))
    assert a == b


def _py_bucket(tok: str, seed: int = 0, dim: int = 4096) -> int:
    return int(hashlib.md5(f"h{seed}:{tok}".encode()).hexdigest()[:12], 16) % dim


def _py_weight(j: int, seed: int = 0) -> float:
    h = int(hashlib.md5(f"w{seed}:{j}".encode()).hexdigest()[:12], 16)
    return round((h % 2001 - 1000) / 1000.0, 6)


def test_hashed_linear_score_matches_python_model(spark):
    import math

    rows = [(1, "the quick brown fox"), (2, ""), (3, None)]
    out = {r.doc_id: (r.n_tokens, r.score) for r in hashed_linear_score(_docs(spark, rows)).collect()}
    toks = ["the", "quick", "brown", "fox"]
    mean_w = sum(_py_weight(_py_bucket(t)) for t in toks) / len(toks)
    want = round(1.0 / (1.0 + math.exp(-mean_w)), 6)
    assert out[1] == (4, pytest.approx(want, abs=1e-6))
    assert out[2] == (0, 0.5)  # sigmoid(bias=0)
    assert out[3] == (0, 0.5)


def test_hashed_linear_score_explicit_weights_vector(spark):
    # the broadcast-weights path: model ships as an array literal and
    # element_at looks buckets up -- an all-equal vector makes every
    # non-empty doc score sigmoid(w) regardless of content
    import math

    w = [0.8] * 64
    df = _docs(spark, [(1, "alpha beta"), (2, "totally different words here")])
    out = hashed_linear_score(df, dim=64, weights=w).collect()
    want = round(1.0 / (1.0 + math.exp(-0.8)), 6)
    assert all(r.score == pytest.approx(want, abs=1e-6) for r in out)
    with pytest.raises(ValueError):
        hashed_linear_score(df, dim=64, weights=[0.1] * 63)


def test_hashed_linear_score_plan_is_narrow(spark):
    # classifier inference must run at scan speed: one Project over the
    # relation, no Exchange anywhere in the plan
    df = _docs(spark, [(1, "x")])
    plan = hashed_linear_score(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_leakage_safe_split_clusters_never_straddle(spark):
    docs = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    # chain 0-1-2, pair 10-11, pair 11-12 (transitive), isolated rest
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (11, 12), (150, 151)], "id_a long, id_b long"
    )
    out = leakage_safe_split(docs, pairs, fractions=(0.5, 0.25, 0.25))
    rows = {r.doc_id: (r.cluster_id, r.split) for r in out.collect()}
    assert len(rows) == 200
    # transitive closure lands whole clusters on one side
    assert rows[0] == rows[1] == rows[2]
    assert rows[10] == rows[11] == rows[12]
    assert rows[150] == rows[151]
    assert rows[0][0] == 0 and rows[10][0] == 10
    # singletons are their own cluster
    assert rows[99] == (99, rows[99][1])
    # all three splits actually occur across 200 docs
    assert {s for _, s in rows.values()} == {"train", "val", "test"}


def test_leakage_safe_split_deterministic_and_fraction_shaped(spark):
    docs = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    a = leakage_safe_split(docs, pairs).groupBy("split").count().collect()
    b = leakage_safe_split(docs, pairs).groupBy("split").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    counts = dict(map(tuple, a))
    assert 0.85 < counts["train"] / 2000 < 0.95
    assert counts["train"] + counts.get("val", 0) + counts.get("test", 0) == 2000


def test_leakage_safe_split_rejects_bad_fractions(spark):
    docs = spark.range(3).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    with pytest.raises(ValueError):
        leakage_safe_split(docs, pairs, fractions=(0.5, 0.2, 0.2))


def test_bigram_logprob_plan_contract(spark, sf_dir):
    """The model build must map-side combine (partial/final HashAggregate
    pairs around each Exchange), the context table and V must ride
    broadcasts, and nothing may cartesian: the corpus-sized bigram
    stream is only ever exchanged on its agg/join keys."""
    import re

    from pgloader_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents", widen=True)
    plan = (
        bigram_logprob(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    # c1 context join + final per-doc join ride broadcasts; the 1-row V
    # table arrives via a BroadcastNestedLoopJoin (cross of one row)
    assert plan.count("BroadcastNestedLoopJoin") <= 2
    assert "BroadcastExchange" in plan
    # every Exchange is fed by a partial HashAggregate (map-side combine)
    # or feeds a join -- no blind corpus repartition
    n_ex = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_ex <= 8, plan


def test_bigram_logprob_matches_python_model_on_random_corpora(spark):
    """Randomized (seeded) cross-check against an independent pure-
    Python implementation of the add-k bigram model — the randomized
    layer the oracle (which shares no code but does share the SQL
    formulation) can't provide."""
    import math
    import random
    import re as _re
    from collections import Counter
    from decimal import Decimal

    def py_model(docs: dict[int, str], min_count=2, k=0.5):
        toks = {
            i: [t for t in _re.split(r"[^a-z0-9]+", (s or "").lower()) if t]
            for i, s in docs.items()
        }
        bigs = {i: list(zip(ts, ts[1:])) for i, ts in toks.items()}
        c2 = Counter(b for bs in bigs.values() for b in bs)
        c1 = Counter()
        for (p, _c), n in c2.items():
            c1[p] += n
        v = len({c for (_p, c) in c2})
        model = {b: n for b, n in c2.items() if n >= min_count}
        out = {}
        for i, bs in bigs.items():
            if not bs:
                out[i] = (0, 0.0)
                continue
            s = Decimal(0)
            for b in bs:
                lp = math.log((model.get(b, 0) + k) / (c1[b[0]] + k * v))
                s += Decimal(str(round(lp, 6)))
            out[i] = (len(bs), float(s) / len(bs))
        return out

    rng = random.Random(20260814)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "x1", "y2"]
    for _trial in range(3):
        docs = {
            i: " ".join(rng.choices(vocab, k=rng.randrange(0, 25)))
            for i in range(30)
        }
        want = py_model(docs)
        df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
        got = {r.doc_id: (r.n_bigrams, r.avg_bigram_logprob) for r in bigram_logprob(df).collect()}
        assert set(got) == set(want)
        for i in want:
            assert got[i][0] == want[i][0], i
            assert got[i][1] == pytest.approx(want[i][1], abs=2e-6), i


def test_leakage_safe_split_reuses_precomputed_clusters(spark):
    """clusters= mode: a precomputed (id, component) mapping replaces
    the pair list and yields EXACTLY the pairs-mode assignment — the
    one-join fast path when dedup already resolved components."""
    from pgloader_spark.operators.components import connected_components

    docs = spark.range(0, 300).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (50, 51), (200, 250)], "id_a long, id_b long"
    )
    via_pairs = {
        r.doc_id: (r.cluster_id, r.split)
        for r in leakage_safe_split(docs, pairs).collect()
    }
    mapping = connected_components(pairs)  # only clustered ids present
    via_clusters = {
        r.doc_id: (r.cluster_id, r.split)
        for r in leakage_safe_split(docs, clusters=mapping).collect()
    }
    assert via_pairs == via_clusters  # missing ids became singletons
    with pytest.raises(ValueError):
        leakage_safe_split(docs)  # neither pairs nor clusters


def test_band_link_edges_matches_pair_components(spark):
    """Star edges from band buckets connect the same components as the
    full within-bucket pair list."""
    from pgloader_spark.operators.components import connected_components
    from pgloader_spark.operators.dedup import (
        band_link_edges,
        minhash_candidate_pairs,
    )

    text = " ".join(f"tok{i}" for i in range(30))
    rows = [
        (1, text),
        (2, text + " tail"),
        (3, text),
        (10, "completely different words " + " ".join(f"z{i}" for i in range(30))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    star = band_link_edges(docs)
    full = minhash_candidate_pairs(docs)
    cc_star = {
        r.id: r.component
        for r in connected_components(
            star, nodes=docs.select(F.col("doc_id").alias("id"))
        ).collect()
    }
    cc_full = {
        r.id: r.component
        for r in connected_components(
            full, nodes=docs.select(F.col("doc_id").alias("id"))
        ).collect()
    }
    assert cc_star == cc_full
    # star output is linear in bucket membership: strictly fewer or
    # equal edges than the quadratic pair list
    assert star.count() <= full.count()


def test_train_hashed_classifier_learns_and_plugs_into_inference(spark):
    """Full-batch distributed GD on a separable seed set: the learned
    (weights, bias) drive hashed_linear_score to separate positives
    from negatives — including held-out docs — and training is
    partition-invariant (decimal gradient folds)."""
    from pgloader_spark.operators.text import (
        hashed_linear_score,
        train_hashed_classifier,
    )

    pos_vocab = [f"good{i}" for i in range(8)]
    neg_vocab = [f"junk{i}" for i in range(8)]
    rows = []
    for d in range(24):
        vocab = pos_vocab if d % 2 == 0 else neg_vocab
        text = " ".join(vocab[(d + j) % 8] for j in range(12))
        rows.append((d, text, 1 if d % 2 == 0 else 0))
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")

    w, b = train_hashed_classifier(
        df, "label", dim=64, epochs=30, lr=4.0, seed=3
    )
    assert len(w) == 64
    scored = {
        r["doc_id"]: r["score"]
        for r in hashed_linear_score(df, dim=64, weights=w, bias=b, seed=3).collect()
    }
    pos = [scored[d] for d in range(24) if d % 2 == 0]
    neg = [scored[d] for d in range(24) if d % 2 == 1]
    assert min(pos) > 0.8 and max(neg) < 0.2

    # held-out docs from the same vocabularies classify correctly
    held = spark.createDataFrame(
        [(100, " ".join(pos_vocab)), (101, " ".join(neg_vocab))],
        "doc_id long, text string",
    )
    hs = {r["doc_id"]: r["score"]
          for r in hashed_linear_score(held, dim=64, weights=w, bias=b, seed=3).collect()}
    assert hs[100] > 0.8 and hs[101] < 0.2

    # partition invariance: same model from a differently-sliced input
    w2, b2 = train_hashed_classifier(
        df.repartition(13), "label", dim=64, epochs=30, lr=4.0, seed=3
    )
    assert w2 == w and b2 == b

    # empty input: zero model, no crash
    w0, b0 = train_hashed_classifier(
        df.filter("label = 2"), "label", dim=8, epochs=2
    )
    assert w0 == [0.0] * 8 and b0 == 0.0
