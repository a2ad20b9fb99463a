"""End-to-end corpus curation: two consecutive runs over JSONL shards,
the second probing the first run's committed index."""

from __future__ import annotations

import json

from pgloader_spark.plans.corpus import curate_corpus


def _write_jsonl(path, rows):
    path.write_text("".join(json.dumps(r) + "\n" for r in rows))


def _doc(i, text, lang="en"):
    return {"doc_id": i, "text": text, "lang": lang}


def test_curate_corpus_two_increments(spark, tmp_path):
    good_a = " ".join(f"alpha{i}" for i in range(40))
    good_b = " ".join(f"beta{i}" for i in range(40))
    good_c = " ".join(f"gamma{i}" for i in range(40))

    day1 = tmp_path / "day1.jsonl"
    _write_jsonl(
        day1,
        [
            _doc(1, good_a),
            _doc(2, good_a),                     # in-batch exact dup
            _doc(3, good_b),
            _doc(4, "too short", "en"),          # quality gate
            _doc(5, good_c, "fr"),               # language gate
        ],
    )
    out1 = str(tmp_path / "run1")
    r1 = curate_corpus(spark, str(day1), out1, export_jsonl=True)
    assert r1["raw"] == 5
    assert r1["curated"] == 2  # good_a (one copy) + good_b
    kept1 = {
        r["doc_id"] for r in spark.read.parquet(out1 + "/curated").collect()
    }
    assert kept1 == {1, 3}
    # the export shipped
    assert spark.read.json(out1 + "/export").count() == 2

    # day 2: an exact repeat, a NEAR repeat, and a genuinely new doc
    day2 = tmp_path / "day2.jsonl"
    _write_jsonl(
        day2,
        [
            _doc(10, good_a),                    # exact dup of day 1
            _doc(11, good_b + " tiny tail"),     # near dup of day 1
            _doc(12, good_c),                    # new (day 1 copy was fr-gated)
        ],
    )
    out2 = str(tmp_path / "run2")
    r2 = curate_corpus(spark, str(day2), out2, snapshot_dir=out1)
    assert r2["raw"] == 3
    kept2 = {
        r["doc_id"] for r in spark.read.parquet(out2 + "/curated").collect()
    }
    assert kept2 == {12}, kept2  # both repeats dropped via the index
    # run 2 committed its own index for run 3
    assert spark.read.parquet(out2 + "/index_digests").count() == 1
    assert spark.read.parquet(out2 + "/index_bands").count() >= 1


def test_curate_corpus_non_english_lang(spark, tmp_path):
    """lang='fr' must keep French survivors (round-3 advice: the funnel
    hard-coded 'en', so any other lang yielded an empty corpus)."""
    good_fr = " ".join(f"mot{i}" for i in range(40))
    good_en = " ".join(f"word{i}" for i in range(40))
    src = tmp_path / "docs.jsonl"
    _write_jsonl(
        src,
        [_doc(1, good_fr, "fr"), _doc(2, good_en, "en"), _doc(3, good_fr, "fr")],
    )
    out = str(tmp_path / "run_fr")
    r = curate_corpus(spark, str(src), out, lang="fr")
    kept = {r2["doc_id"] for r2 in spark.read.parquet(out + "/curated").collect()}
    assert kept == {1}, kept  # doc 3 is an in-batch exact dup of doc 1
    assert r["curated"] == 1


def test_curate_corpus_preserves_source_ts(spark, tmp_path):
    """A source-provided ts column must survive into the curated output
    (only the synthesized ts is excluded)."""
    good = " ".join(f"tok{i}" for i in range(40))
    src = tmp_path / "docs_ts.jsonl"
    _write_jsonl(src, [dict(_doc(1, good), ts="2026-01-02T03:04:05Z")])
    out = str(tmp_path / "run_ts")
    curate_corpus(spark, str(src), out)
    cur = spark.read.parquet(out + "/curated")
    assert "ts" in cur.columns
    assert cur.count() == 1
