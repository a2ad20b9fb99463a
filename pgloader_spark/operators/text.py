"""Text-analysis operators for training-data pipelines.

All operators are pure Column-expression builders (JVM-side,
codegen-friendly, no Python in the row path) so they hold up on a
100 TB documents table: tokenization, token counting, quality
scoring, n-gram language ID, and document fingerprinting.

Every function here has a DuckDB-SQL mirror in
``pgloader_spark.queries`` so results are oracle-checked value-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window as W
from pyspark.sql import functions as F
# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic.  Deterministic and mirrored verbatim in the DuckDB oracle.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "des", "du", "que"),
    "es": ("el", "la", "los", "las", "y", "es", "un", "una", "de", "que"),
    "zh": ("de", "shi", "le", "zai", "he", "you", "wo", "ta", "men", "bu"),
}

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokens(col: Column | str) -> Column:
    """Lowercased alnum tokens (empty strings dropped)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda t: t != F.lit(""))


def token_count(col: Column | str) -> Column:
    """Whitespace/punct token count — the cheap tokenizer."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """A BPE-like proxy: ceil(chars/4) per word, summed.

    Approximates subword-tokenizer counts without a vocab file; stays
    in codegen (no UDF).
    """
    return F.aggregate(
        tokens(col),
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("long"),
    )


def quality_metrics(
    text_col: Column | str, toks: Column | None = None
) -> dict[str, Column]:
    """Length / punctuation-ratio / stopword-ratio / mean-word-length.

    The standard cheap quality filters a pretraining pipeline applies
    before expensive dedup (cf. C4/Gopher-style rules — public
    heuristics, re-derived here).

    Pass ``toks`` (a materialized token-array column) to avoid
    re-tokenizing once per metric — higher-order array expressions are
    interpreted, so recomputation is the dominant cost at scale.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = tokens(c) if toks is None else toks
    n_tok = F.size(toks)
    n_chars = F.length(c)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    n_stop = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in STOPWORDS["en"]])))
    mean_wlen = F.when(
        n_tok > 0,
        F.round(
            F.aggregate(
                toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t).cast("long")
            )
            / n_tok.cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "punct_ratio": F.round(n_punct.cast("double") / F.greatest(n_chars, F.lit(1)), 6),
        "stopword_ratio": F.round(
            n_stop.cast("double") / F.greatest(n_tok, F.lit(1)).cast("double"), 6
        ),
        "mean_word_len": mean_wlen,
    }


def gopher_quality_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_word_frac: float = 0.80,
    min_distinct_stopwords: int = 2,
    max_symbol_word_ratio: float = 0.10,
    max_bullet_line_frac: float = 0.90,
    max_ellipsis_line_frac: float = 0.30,
) -> DataFrame:
    """Gopher-style composite quality gate (Rae et al. 2021 §A1.1,
    public heuristics re-derived): per-document rule booleans plus the
    AND-of-all ``keep`` flag.

    The whole gate is ONE narrow Column pass — tokenization happens
    once, every rule is a codegen'd expression over it, and at 100 TB
    the filter runs at scan speed BEFORE any shuffle-bearing stage
    (dedup, classifier scoring), which is exactly where pretraining
    pipelines put it.  Thresholds are keyword-tunable; defaults follow
    the paper except ``min_words`` (20, matched to short-doc corpora;
    the paper's 50 assumes web pages).

    Repetition gates (dup n-gram fractions) are deliberately NOT
    re-implemented here — compose with ``text_repetition``'s columns
    when those signals are needed; they cost an n-gram materialization
    this scan-speed gate avoids.
    """
    c = F.col(text_col)
    toks = tokens(c)
    n_tok = F.size(toks)
    nz = F.greatest(n_tok, F.lit(1)).cast("double")
    mean_wlen = F.when(
        n_tok > 0,
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t).cast("long")
        )
        / n_tok.cast("double"),
    ).otherwise(F.lit(0.0))
    alpha_frac = (
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("double") / nz
    )
    n_stop_distinct = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(w) for w in STOPWORDS["en"]]),
        )
    )
    symbol_ratio = F.regexp_count(c, F.lit(r"#|\.\.\.")).cast("double") / nz
    lines = F.split(c, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_frac = (
        F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]"))).cast("double")
        / n_lines
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda l: l.rlike(r"\.\.\.\s*$"))).cast("double")
        / n_lines
    )
    rules = {
        "rule_word_count": (n_tok >= min_words) & (n_tok <= max_words),
        "rule_mean_word_len": (mean_wlen >= min_mean_word_len)
        & (mean_wlen <= max_mean_word_len),
        "rule_alpha_words": alpha_frac >= min_alpha_word_frac,
        "rule_stopwords": n_stop_distinct >= min_distinct_stopwords,
        "rule_symbol_ratio": symbol_ratio <= max_symbol_word_ratio,
        "rule_bullet_lines": bullet_frac <= max_bullet_line_frac,
        "rule_ellipsis_lines": ellipsis_frac <= max_ellipsis_line_frac,
    }
    keep = None
    for expr in rules.values():
        keep = expr if keep is None else (keep & expr)
    return df.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_words"),
        *[v.alias(k) for k, v in rules.items()],
        keep.alias("keep"),
    )


def lang_scores(
    text_col: Column | str, dtk: Column | None = None
) -> dict[str, Column]:
    """Per-language stopword-hit ratio over the distinct token set.

    ``dtk``: optional pre-materialized distinct-token array column.
    """
    toks = F.array_distinct(tokens(text_col)) if dtk is None else dtk
    out = {}
    for lang, words in STOPWORDS.items():
        hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        out[lang] = F.round(
            hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double"), 6
        )
    return out


def lang_id(text_col: Column | str, dtk: Column | None = None) -> Column:
    """argmax over lang_scores; ties broken by language-code order."""
    from pgloader_spark.operators.hof import let

    toks = F.array_distinct(tokens(text_col)) if dtk is None else dtk

    def score_pairs(tk: Column) -> Column:
        # tk is let-bound: the per-language intersects share one
        # tokenize+distinct pass (17 re-evaluations otherwise)
        scores = lang_scores(text_col, dtk=tk)
        return F.array(
            *[
                F.struct(scores[lang].alias("s"), F.lit(lang).alias("l"))
                for lang in sorted(STOPWORDS)
            ]
        )

    def pick(pairs: Column) -> Column:
        # max score; tie -> lexicographically-smallest code wins
        # because we pick the first element reaching the max in
        # sorted order.  pairs is let-bound too: `best` inside the
        # filter lambda re-evaluates per element, so it must reduce
        # over an attribute, not the score expressions.
        best = F.array_max(F.transform(pairs, lambda p: p["s"]))
        return F.filter(pairs, lambda p: p["s"] == best)[0]["l"]

    return let(toks, lambda tk: let(score_pairs(tk), pick))


def fingerprint(text_col: Column | str) -> Column:
    """Normalization fingerprint: md5 over the sorted distinct token set.

    Catches reordered/duplicated-whitespace copies of a document;
    O(tokens log tokens) per row, no shuffle.
    """
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(text_col))), " "))


def rolling_hash(text_col: Column | str, mod: int = (1 << 61) - 1, base: int = 257) -> Column:
    """Polynomial rolling hash over tokens: h = sum(tok_hash * base^i) mod p.

    Folded left-to-right with F.aggregate (deterministic order).
    """
    toks = tokens(text_col)
    return F.aggregate(
        toks,
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, t: (
            acc * F.lit(base)
            + F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("decimal(38,0)")
        )
        % F.lit(mod),
    ).cast("long")


def document_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One-pass per-document stat projection (narrow, no shuffle).

    Tokens are materialized in a first projection so each metric reuses
    them (CollapseProject keeps non-cheap expressions un-inlined).
    """
    staged = df.select(
        F.col(id_col), F.col(text_col), tokens(text_col).alias("__tk")
    ).withColumn("__dtk", F.array_distinct(F.col("__tk")))
    q = quality_metrics(text_col, toks=F.col("__tk"))
    return staged.select(
        F.col(id_col),
        q["n_chars"].alias("n_chars"),
        q["n_tokens"].alias("n_tokens"),
        q["punct_ratio"].alias("punct_ratio"),
        q["stopword_ratio"].alias("stopword_ratio"),
        q["mean_word_len"].alias("mean_word_len"),
        lang_id(text_col, dtk=F.col("__dtk")).alias("lang_pred"),
        F.md5(F.array_join(F.array_sort(F.col("__dtk")), " ")).alias("fingerprint"),
    )


# --------------------------------------------------------------------------
# Repetition / diversity signals (Gopher-style quality heuristics)
# --------------------------------------------------------------------------


def ngrams_of(toks: Column, n: int) -> Column:
    """Order-preserving word n-grams of a token ARRAY column.

    Documents with fewer than n tokens yield an empty array (unlike
    dedup.shingles, which falls back to the whole stream — repetition
    metrics must not fabricate a pseudo-n-gram).
    """
    # let-bind the (possibly expensive) token expression through a
    # single-element transform: HOF lambdas are interpreted with no
    # common-subexpression elimination, so slicing the raw expression
    # re-evaluates it once PER n-gram — O(t^2) per doc when the
    # caller passes tokens(text) directly (decontam, word_ngrams)
    def body(tk: Column) -> Column:
        cnt = F.size(tk)
        return F.when(cnt < n, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), cnt - (n - 1)),
                lambda i: F.array_join(F.slice(tk, i, n), " "),
            )
        )

    return F.flatten(F.transform(F.array(toks), body))


def word_ngrams(col: Column | str, n: int) -> Column:
    """Order-preserving word n-grams of the token stream (array column)."""
    return ngrams_of(tokens(col), n)


def dup_ngram_fraction(col: Column | str, n: int, grams: Column | None = None) -> Column:
    """Fraction of n-gram occurrences that are repeats of an earlier
    one: 1 - distinct/total (0 for empty docs).

    The standard repetition filter for pretraining corpora (documents
    full of boilerplate loops score high). Pure array math — narrow,
    no shuffle, linear per row.

    Pass ``grams`` (a staged n-gram array column) in multi-metric
    projections: interpreted array HOFs get no codegen CSE, so every
    embedded copy of the expression re-tokenizes the document.
    """
    grams = word_ngrams(col, n) if grams is None else grams
    total = F.size(grams)
    dis = F.size(F.array_distinct(grams))
    return F.when(total > 0, F.round(1.0 - dis / total.cast("double"), 6)).otherwise(
        F.lit(0.0)
    )


def top_ngram_fraction(col: Column | str, n: int, grams: Column | None = None) -> Column:
    """Occurrences of the most frequent n-gram / total n-grams.

    O(t log t) per row: sort the grams, then fold a (prev, run, best)
    state over the sorted array — the longest equal-run IS the top
    count. The naive distinct×filter formulation is O(distinct *
    total), which turns a 10k-token document into 10^8 comparisons;
    run-length over a sort stays linear after the sort.
    """
    grams = word_ngrams(col, n) if grams is None else grams
    total = F.size(grams)
    best = _max_sorted_run(F.array_sort(grams))
    return F.when(
        total > 0,
        F.round(best.cast("double") / total.cast("double"), 6),
    ).otherwise(F.lit(0.0))


def _max_sorted_run(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent elements in a sorted array."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )
    step = lambda acc, x: F.struct(  # noqa: E731
        x.alias("prev"),
        F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
        F.greatest(
            acc["best"],
            F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1)),
        ).alias("best"),
    )
    return F.aggregate(sorted_arr, init, step, lambda acc: acc["best"])


def token_entropy(col: Column | str, toks: Column | None = None) -> Column:
    """Shannon entropy (nats) of the token distribution per document.

    Low entropy = repetitive/templated text. O(t log t) per row: fold
    run lengths over the SORTED token array, closing each run with its
    -(p ln p) term. Terms are added in sorted-distinct-token order —
    the same order the DuckDB mirror sums in, which matters because
    float addition is non-associative and the oracle hash-compares.
    """
    toks = tokens(col) if toks is None else toks
    n = F.size(toks)
    nd = n.cast("double")

    def term(run: Column) -> Column:
        p = run.cast("double") / nd
        return p * F.log(p)

    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0.0).alias("acc"),
    )

    def step(acc: Column, x: Column) -> Column:
        same = x.eqNullSafe(acc["prev"])
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            # close the previous run when the token changes
            F.when(same | (acc["run"] == 0), acc["acc"])
            .otherwise(acc["acc"] + term(acc["run"]))
            .alias("acc"),
        )

    ent = F.aggregate(
        F.array_sort(toks),
        init,
        step,
        lambda acc: -(
            F.when(acc["run"] > 0, acc["acc"] + term(acc["run"])).otherwise(acc["acc"])
        ),
    )
    return F.when(n > 0, F.round(ent, 6)).otherwise(F.lit(0.0))


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One-pass repetition/diversity projection (narrow, no shuffle).

    Stages the token and n-gram arrays in explicit projections so each
    is computed ONCE per row: the metric expressions are interpreted
    array HOFs (no whole-stage codegen, hence no common-subexpression
    elimination), and inlining them would re-tokenize the document
    once per embedded copy — measured 10x slower at sf0.1.
    CollapseProject leaves multiply-referenced non-cheap projections
    staged, so the optimizer preserves this structure.
    """
    staged = df.select(
        F.col(id_col), tokens(text_col).alias("__tk")
    ).select(
        id_col,
        "__tk",
        ngrams_of(F.col("__tk"), 2).alias("__g2"),
        ngrams_of(F.col("__tk"), 3).alias("__g3"),
    )
    return staged.select(
        F.col(id_col),
        dup_ngram_fraction(text_col, 2, grams=F.col("__g2")).alias(
            "dup_bigram_frac"
        ),
        dup_ngram_fraction(text_col, 3, grams=F.col("__g3")).alias(
            "dup_trigram_frac"
        ),
        top_ngram_fraction(text_col, 2, grams=F.col("__g2")).alias(
            "top_bigram_frac"
        ),
        token_entropy(text_col, toks=F.col("__tk")).alias("token_entropy"),
    )


# --------------------------------------------------------------------------
# Redaction / normalization
# --------------------------------------------------------------------------

# Patterns chosen to mean the same thing in Java regex (Spark) and RE2
# (DuckDB): no backrefs, no lookaround.
REDACT_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"https?://[^\s]+", "<URL>"),
    (r"[0-9]{6,}", "<NUM>"),
)


def redact(col: Column | str) -> Column:
    """Replace emails, URLs, and long digit runs with typed tags.

    The cheap PII pre-filter a pretraining pipeline runs before any
    model-based scrubber; pure regexp_replace chain, JVM-side.
    """
    c = F.col(col) if isinstance(col, str) else col
    for pat, tag in REDACT_PATTERNS:
        c = F.regexp_replace(c, pat, tag)
    return c


def normalize_text(col: Column | str) -> Column:
    """Lowercase, collapse all whitespace runs to single spaces, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


# --------------------------------------------------------------------------
# TF-IDF
# --------------------------------------------------------------------------


def tfidf_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF.

    tf = occurrences in the doc; idf = ln((N+1)/(df+1)) + 1 (smooth).
    Shuffle budget: one groupBy (doc, term), one groupBy term for
    document frequency, one window per doc — each keyed differently
    but all map-side-combinable. The corpus size N rides a 1-row
    broadcast, never a driver collect.
    """
    tok_rows = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = tok_rows.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = F.log((F.col("n_docs") + 1).cast("double") / (F.col("df") + 1)) + F.lit(1.0)
    scored = (
        tf.join(docfreq, "term")
        .join(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            F.col("term"),
            F.round(F.col("tf") * idf, 6).alias("tfidf"),
        )
    )
    rn = F.row_number().over(
        W.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    )
    return (
        scored.withColumn("rnk", rn)
        .filter(F.col("rnk") <= k)
        .select(id_col, "term", "tfidf", F.col("rnk").cast("int").alias("rnk"))
    )


def bm25_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qtext_col: str = "query_text",
) -> DataFrame:
    """Okapi BM25 lexical retrieval: top-k documents per query.

    Index side (one pass over the corpus): per-(doc, term) frequency
    and per-doc length from one explode + two keyed aggs; N and avgdl
    ride a 1-row broadcast.  Probe side: the query batch is small by
    contract, so its distinct terms BROADCAST onto the exploded token
    stream BEFORE the tf aggregation (r9: the prune commutes with the
    per-(doc, term) count, and pruning after it shuffled the ENTIRE
    corpus's token pairs — partial aggregation barely reduces a
    diverse corpus's (doc, term) stream, and that one corpus-sized
    exchange was both the wall and the host-GC-sensitivity of this
    query).  A 100 TB corpus now shuffles only postings of query
    terms; document frequency is computed over those postings alone
    (no full-vocabulary agg), and the resulting tiny per-term idf
    broadcasts back.  The doc-length agg still scans the corpus but
    its map-side combine reduces to one row per (partition, doc) —
    a small exchange by construction.

    idf = ln(1 + (N - df + 0.5) / (df + 0.5)); repeated query terms
    count once (qtf ignored, the common IR simplification).  Ranking
    orders on the 6-dp-rounded score with id tiebreak so cross-engine
    double noise cannot flip ranks.
    """
    # r10 opt (guide §2.3/§2.4): the document length is a PER-ROW
    # property — ``size(tokens(text))`` — so it never needs the old
    # corpus-doc-keyed ``tok.groupBy(id)`` exchange, and carrying it
    # through the posting rows removes the post⋈dl shuffle join
    # entirely.  The plan now has ZERO corpus-sized exchanges: the
    # corpus is scanned twice narrowly (once for the 1-row stats agg,
    # once for the pruned posting stream), and every shuffle
    # downstream is bounded by postings-of-query-terms.  Values are
    # unchanged: dl = count of exploded tokens = size of the token
    # array, and docs with no tokens are excluded from N/avgdl by the
    # dl>0 filter exactly as the explode-based agg excluded them.
    dlc = F.size(tokens(text_col))
    stats = (
        df.select(dlc.alias("dl"))
        .filter(F.col("dl") > 0)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg(F.col("dl").cast("double")).alias("avgdl"),
        )
    )
    qterms = queries.select(
        F.col(qid_col).cast("long").alias(qid_col),
        F.explode(F.array_distinct(tokens(qtext_col))).alias("term"),
    )
    post = (
        df.select(F.col(id_col), tokens(text_col).alias("__tk"))
        .select(
            F.col(id_col),
            F.size("__tk").cast("long").alias("dl"),
            F.explode("__tk").alias("term"),
        )
        .join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    qdf = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = idf * (
        F.col("tf") * (k1 + 1.0)
        / (
            F.col("tf")
            + k1
            * (1.0 - b + b * F.col("dl").cast("double") / F.col("avgdl"))
        )
    )
    scored = (
        post.join(F.broadcast(qdf), "term")
        .join(F.broadcast(stats))
        .join(F.broadcast(qterms), "term")
        .groupBy(qid_col, id_col)
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )
    rn = F.row_number().over(
        W.partitionBy(qid_col).orderBy(F.desc("score"), F.asc(id_col))
    )
    return (
        scored.withColumn("rnk", rn)
        .filter(F.col("rnk") <= k)
        .select(qid_col, id_col, "score", F.col("rnk").cast("int").alias("rnk"))
    )


# --------------------------------------------------------------------------
# Unigram language-model scoring (CCNet-style perplexity proxy)
# --------------------------------------------------------------------------


def unigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Mean log-probability of each document under the corpus' own
    unigram distribution — the cheap stand-in for the KenLM perplexity
    filter CCNet/CCNet-style pipelines run: documents of rare-token
    soup score far below fluent text.

    Two-pass shape that scales: pass 1 builds the unigram model (one
    groupBy on term — vocabulary-sized output, even web-scale corpora
    have ≪ broadcast-limit distinct tokens after lowercasing); pass 2
    broadcast-joins the model back onto the exploded token stream and
    aggregates per document (one groupBy on the id, map-side
    combinable). The corpus total rides a 1-row broadcast.

    Float discipline: per-token log-probs are rounded to 6 dp and
    summed as DECIMAL(18,6), so the per-doc sum is independent of
    partitioning/order and reproducible on any engine; only the final
    mean divides in doubles (one IEEE-exact op).
    """
    tok_rows = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    vocab = tok_rows.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    model = vocab.crossJoin(F.broadcast(total)).select(
        "term",
        F.round(
            F.log(F.col("cnt") / F.col("total").cast("double")), 6
        ).alias("logp"),
    )
    per_doc = (
        tok_rows.join(F.broadcast(model), "term")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("logp").cast("decimal(18,6)")).alias("slp"),
        )
    )
    return df.select(F.col(id_col)).join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("int").alias("n_tokens"),
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.col("slp").cast("double") / F.col("n_tokens"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("avg_logprob"),
    )


def chunk_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Token-window chunking: one row per (doc, chunk) with a content
    digest — the context-window preparation step between cleaning and
    sequence packing in a pretraining pipeline (overlapping windows:
    ``window`` tokens every ``stride``).

    Pure sequence + explode + slice — narrow, JVM-side, no shuffle;
    a 100 TB corpus chunks at scan speed.  Documents with no tokens
    emit no chunks.
    """
    toks = tokens(text_col)
    # sequence() rejects start > stop with a positive step, so the
    # empty-document case must short-circuit to an empty array
    starts = F.when(
        F.size(toks) >= 1,
        F.sequence(F.lit(1), F.size(toks), F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    base = df.select(
        F.col(id_col), toks.alias("__tk"), F.explode(starts).alias("start_tok")
    )
    piece = F.slice(F.col("__tk"), F.col("start_tok"), window)
    return base.select(
        F.col(id_col),
        ((F.col("start_tok") - 1) / stride).cast("int").alias("chunk_ix"),
        F.col("start_tok").cast("int"),
        F.least(
            F.lit(window), F.size("__tk") - F.col("start_tok") + 1
        ).cast("int").alias("n_tok"),
        F.md5(F.array_join(piece, " ")).alias("chunk_md5"),
    )


def c4_line_clean(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    min_kept_lines: int = 3,
    require_terminal_punct: bool = True,
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2 rules,
    re-expressed as deterministic Column predicates): keep only lines
    that end in terminal punctuation, carry >= 5 words, and are free
    of javascript/code markers; keep the document when >= 3 lines
    survive and the text is not boilerplate ("lorem ipsum").

    Pure split + array-HOF filter — narrow, JVM-side, no shuffle; the
    whole pass runs at scan speed on any corpus size.  Emits audit
    columns (line counts, cleaned length) so the drop reasons are
    inspectable downstream.
    """
    lines = F.split(F.col(text_col), "\n")

    def line_ok(line):
        wc = F.size(F.filter(F.split(line, " "), lambda w: w != F.lit("")))
        ok = (
            (wc >= F.lit(min_words))
            & ~F.contains(F.lower(line), F.lit("javascript"))
            & ~F.contains(line, F.lit("{"))
        )
        if require_terminal_punct:
            ok = ok & F.rtrim(line).rlike('[.!?"]$')
        return ok

    kept = F.filter(lines, line_ok)
    return df.select(
        F.col(id_col),
        F.size(lines).cast("int").alias("n_lines"),
        F.size(kept).cast("int").alias("n_kept"),
        F.length(F.array_join(kept, "\n")).cast("bigint").alias("cleaned_len"),
        (
            (F.size(kept) >= min_kept_lines)
            & ~F.contains(F.lower(F.col(text_col)), F.lit("lorem ipsum"))
        ).alias("keep_doc"),
    )


def bigram_stream(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per in-document bigram transition: (id, prev, cur).

    Built narrowly — zip the token array against its own tail and
    explode — so the bigram stream materializes at scan speed with no
    shuffle; every downstream consumer decides its own keying.
    """
    tk = tokens(text_col)
    pairs = F.zip_with(
        tk,
        F.slice(tk, 2, F.greatest(F.size(tk) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
    )
    return (
        df.select(F.col(id_col), F.explode(pairs).alias("bg"))
        # zip_with pads the shorter (tail) side with NULL: the last
        # token has no successor — drop that sentinel row.
        .where(F.col("bg.cur").isNotNull())
        .select(F.col(id_col), F.col("bg.prev").alias("prev"), F.col("bg.cur").alias("cur"))
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    k: float = 0.5,
) -> DataFrame:
    """Mean bigram log-probability per document under an add-k-smoothed
    bigram model trained on the corpus itself — the next rung above
    ``unigram_logprob`` on the CCNet/KenLM perplexity-filter ladder
    (fluent prose scores high; shuffled or boilerplate-soup text falls
    off a cliff because its *transitions* are rare even when its
    unigrams are common).

    Model: logp(cur | prev) = ln((c2 + k) / (c1 + k·V)) where c2 is the
    corpus bigram count, c1 = Σ_cur c2 (the context count), and V the
    number of distinct successor types.  Bigrams below ``min_count``
    are pruned from the shipped model (they back off to the unseen
    mass ln(k / (c1 + k·V))) — the standard Zipf truncation that keeps
    a web-scale model join-able: hapax bigrams dominate the distinct
    count but carry no filtering signal.

    Scale shape (100 TB): the bigram stream never collects — the model
    is built with one (prev,cur)-keyed groupBy (map-side combinable),
    scoring joins the pruned model back on the same key (shuffle join;
    both sides hash-partition on the bigram so it co-locates), and the
    context table c1 — vocabulary-sized, like the unigram model — rides
    a broadcast.  Per-token log-probs round to 6 dp and sum as
    DECIMAL(18,6): partition- and order-invariant, engine-exact.
    """
    big = bigram_stream(df, id_col, text_col)
    # the c2 aggregation subtree repeats under c1/v/model, but Spark's
    # ReusedExchange computes the shared shuffle ONCE within the
    # action — an explicit persist measured SLOWER at sf0.1 (cache
    # materialization cost for zero saved work), so c2 stays unpinned
    c2 = big.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c2"))
    c1 = c2.groupBy("prev").agg(F.sum("c2").alias("c1"))
    v = c2.agg(F.count_distinct("cur").alias("v"))
    model = c2.filter(F.col("c2") >= min_count)

    scored = (
        big.join(model, ["prev", "cur"], "left")
        .join(F.broadcast(c1), "prev")
        .crossJoin(F.broadcast(v))
        .select(
            F.col(id_col),
            F.round(
                F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(k))
                    / (F.col("c1") + F.lit(k) * F.col("v"))
                ),
                6,
            ).alias("logp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(F.col("logp").cast("decimal(18,6)")).alias("slp"),
    )
    return df.select(F.col(id_col)).join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("int").alias("n_bigrams"),
        F.when(
            F.col("n_bigrams") > 0,
            F.round(F.col("slp").cast("double") / F.col("n_bigrams"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("avg_bigram_logprob"),
    )


def hashed_weight(j: Column, seed: int = 0) -> Column:
    """Deterministic pseudo-weight in [-1, 1] for feature bucket ``j``,
    derived from md5 so DuckDB reproduces it bit-for-bit — the
    engine-portable stand-in for a trained weight vector in tests and
    oracle queries.
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"w{seed}:"), j.cast("string"))), 1, 12),
        16,
        10,
    ).cast("long")
    return (h % F.lit(2001) - F.lit(1000)) / F.lit(1000.0)


def hashed_linear_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 4096,
    weights: list[float] | None = None,
    bias: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """fastText-style linear quality-classifier INFERENCE: each token
    hashes into one of ``dim`` buckets, the bucket's weight is looked
    up, and the document scores sigmoid(bias + mean weight) — the
    shape of every "educational value" / "quality" scorer the big
    pretraining pipelines run over the full corpus.

    The entire scorer is one narrow Column expression — no join, no
    shuffle, no Python: with a real ``weights`` vector the model ships
    inside the plan as an array literal (the broadcast-weights
    pattern; a 4k-float model is ~32 KB of task binary), and the
    per-token lookup is ``element_at``.  A 100 TB corpus classifies at
    scan speed, which is the whole reason hashed linear models beat
    transformers for corpus-wide filtering.

    Without ``weights`` the bucket weight derives from md5
    (``hashed_weight``) so the operator stays oracle-checkable
    end-to-end.  Per-token weights round to 6 dp and fold as
    DECIMAL(28,6) — order- and engine-invariant.
    """
    if weights is not None and len(weights) != dim:
        raise ValueError(f"weights has {len(weights)} entries, dim={dim}")

    def bucket(tok: Column) -> Column:
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit(f"h{seed}:"), tok)), 1, 12), 16, 10
        ).cast("long")
        return h % F.lit(dim)

    if weights is None:
        def w_of(tok: Column) -> Column:
            return F.round(hashed_weight(bucket(tok), seed), 6)
    else:
        warr = F.array(*[F.lit(round(float(w), 6)) for w in weights])

        def w_of(tok: Column) -> Column:
            return F.element_at(warr, (bucket(tok) + 1).cast("int"))

    tk = tokens(text_col)
    n = F.coalesce(F.size(tk), F.lit(0))  # NULL text -> 0 tokens, not NULL
    ssum = F.aggregate(
        tk,
        F.lit(0).cast("decimal(28,6)"),
        # re-cast each step: decimal addition widens (28,6)+(28,6)->(29,6)
        # and aggregate() requires the accumulator type to be stable
        lambda acc, t: (acc + w_of(t).cast("decimal(28,6)")).cast("decimal(28,6)"),
    )
    z = F.lit(bias) + F.when(n > 0, ssum.cast("double") / n).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        n.cast("int").alias("n_tokens"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("score"),
    )


def train_hashed_classifier(
    df: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 4096,
    epochs: int = 10,
    lr: float = 2.0,
    l2: float = 0.0,
    seed: int = 0,
) -> tuple[list[float], float]:
    """Distributed logistic-regression TRAINING for the hashed linear
    classifier — the missing half of :func:`hashed_linear_score`: the
    big pretraining pipelines train exactly this model (fastText-style
    quality/"educational value" scorers) on labeled seed sets, then
    run the learned weights over the full corpus at scan speed.

    Model: p = sigmoid(bias + mean-over-tokens of w[bucket(token)]),
    the same bucket hash as the inference op, so the returned
    ``(weights, bias)`` plug straight into
    ``hashed_linear_score(df, weights=w, bias=b)``.

    Scale shape (full-batch gradient descent, one round-trip per
    epoch): token features materialize ONCE as a per-(doc, bucket)
    count table (one keyed shuffle, persisted); each epoch scores
    every doc with the current weights shipped as an array literal
    (no join for the lookup), reduces the per-bucket gradient with a
    map-side-combinable SUM whose output is MODEL-sized (dim rows),
    and collects only those dim floats to the driver.  Nothing
    corpus-sized ever reaches the driver, and epochs cost two
    exchanges each — the classic "model fits on the driver, data
    never leaves the cluster" regime.

    Determinism: gradient terms round to fixed precision and fold as
    DECIMAL, so the learned weights are independent of partitioning
    (pinned by test) — the property every reproducible data-pipeline
    training job needs.
    """
    docs = df.select(
        F.col(id_col).alias("id"),
        F.col(label_col).cast("double").alias("y"),
        tokens(text_col).alias("tk"),
    ).filter(F.size("tk") > 0)

    def bucket(tok: Column) -> Column:
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit(f"h{seed}:"), tok)), 1, 12), 16, 10
        ).cast("long")
        return h % F.lit(dim)

    # per-(doc, bucket): x = count/n_tokens rounded to 9 dp — the one
    # corpus-sized shuffle, computed once and reused every epoch
    feats = (
        docs.select(
            "id", "y", F.size("tk").alias("n"), F.explode("tk").alias("tok")
        )
        .select("id", "y", "n", bucket(F.col("tok")).cast("int").alias("b"))
        .groupBy("id", "y", "n", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "id",
            "y",
            "b",
            F.round(F.col("cnt") / F.col("n"), 9)
            .cast("decimal(20,9)")
            .alias("x"),
        )
        .persist()
    )
    n_docs = feats.select("id").distinct().count()
    if n_docs == 0:
        feats.unpersist()
        return [0.0] * dim, 0.0

    w = [0.0] * dim
    bias = 0.0
    for _ in range(epochs):
        warr = F.array(*[F.lit(round(wi, 9)) for wi in w])
        # per-doc margin: one shuffle on id (co-located with feats'
        # own partitioning), output = docs rows of 3 columns
        scored = (
            feats.groupBy("id", "y")
            .agg(
                F.sum(
                    F.col("x")
                    * F.element_at(warr, F.col("b") + 1).cast("decimal(20,9)")
                ).alias("dot")
            )
            .select(
                "id",
                "y",
                F.round(
                    F.lit(1.0)
                    / (
                        F.lit(1.0)
                        + F.exp(-(F.lit(bias) + F.col("dot").cast("double")))
                    ),
                    9,
                ).alias("p"),
            )
        )
        # per-bucket gradient: decimal fold -> dim rows -> driver
        g_rows = (
            feats.join(scored.select("id", "p"), "id")
            .groupBy("b")
            .agg(
                F.sum(
                    (F.col("p").cast("decimal(20,9)") - F.col("y").cast("decimal(20,9)"))
                    * F.col("x")
                ).alias("g")
            )
            .collect()
        )
        gb = float(
            scored.agg(
                F.sum(F.col("p").cast("decimal(20,9)") - F.col("y").cast("decimal(20,9)"))
            ).collect()[0][0]
        )
        grad = {int(r["b"]): float(r["g"]) for r in g_rows}
        w = [
            round(wi - lr * (grad.get(j, 0.0) / n_docs + l2 * wi), 9)
            for j, wi in enumerate(w)
        ]
        bias = round(bias - lr * gb / n_docs, 9)
    feats.unpersist()
    return w, bias


# --------------------------------------------------------------------------
# BPE tokenizer training (Sennrich et al. 2016), distributed
# --------------------------------------------------------------------------


def bpe_train_from_freqs(
    word_freqs: dict[str, int],
    n_merges: int,
    min_pair_count: int = 2,
) -> list[tuple[int, str, str, str, int]]:
    """The classic incremental-pair-count BPE trainer (Sennrich et
    al. 2016 shape) over an in-memory word-frequency table; returns
    [(merge_rank, left, right, merged, pair_count), ...].

    Cost model: pair counts update by DELTA — a merge touches only
    the words that contain the winning pair (tracked in a pair->words
    index), and the argmax is a lazy-deletion heap, so a merge round
    costs O(words containing the pair), not O(vocabulary).  32k
    merges over a real vocabulary run in seconds, where a
    recount-everything loop is quadratic.

    Words carry the conventional ``</w>`` end-of-word marker on their
    final character.  Ties break on (count DESC, left ASC, right
    ASC); training stops early when the best pair occurs fewer than
    ``min_pair_count`` times.
    """
    import heapq

    words: list[list] = []  # [symbols list, count] per distinct word
    for w, c in word_freqs.items():
        if not w:
            continue
        words.append([list(w[:-1]) + [w[-1] + "</w>"], int(c)])
    stats: dict[tuple[str, str], int] = {}
    index: dict[tuple[str, str], set[int]] = {}
    for wi, (syms, c) in enumerate(words):
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            stats[p] = stats.get(p, 0) + c
            index.setdefault(p, set()).add(wi)
    # heap entries are (-count, left, right); stale entries (count
    # changed since push) are detected against stats and discarded
    heap = [(-c, p[0], p[1]) for p, c in stats.items()]
    heapq.heapify(heap)
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = None
        while heap:
            nc, left, right = heap[0]
            if stats.get((left, right), 0) == -nc:
                best, bc = (left, right), -nc
                break
            heapq.heappop(heap)  # stale
        if best is None or bc < min_pair_count:
            break
        left, right = best
        merged = left + right
        merges.append((rank, left, right, merged, bc))
        for wi in index.pop(best, set()):
            syms, c = words[wi]
            if not any(
                syms[i] == left and syms[i + 1] == right
                for i in range(len(syms) - 1)
            ):
                continue  # index entry gone stale via an earlier merge
            for i in range(len(syms) - 1):  # retract the old pairs
                p = (syms[i], syms[i + 1])
                left_over = stats[p] - c
                if left_over <= 0:
                    del stats[p]
                else:
                    stats[p] = left_over
                    heapq.heappush(heap, (-left_over, p[0], p[1]))
            out: list[str] = []  # greedy left-to-right rewrite
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi][0] = out
            for i in range(len(out) - 1):  # add the new pairs
                p = (out[i], out[i + 1])
                stats[p] = stats.get(p, 0) + c
                heapq.heappush(heap, (-stats[p], p[0], p[1]))
                index.setdefault(p, set()).add(wi)
    return merges


def bpe_learn(
    df: DataFrame,
    n_merges: int = 24,
    text_col: str = "text",
    min_pair_count: int = 2,
    max_vocab: int | None = 2_000_000,
) -> list[tuple[int, str, str, str, int]]:
    """Learn BPE merges; returns
    [(merge_rank, left, right, merged, pair_count), ...].

    The scale split that makes BPE training cheap at 100 TB: merge
    statistics depend ONLY on the word-frequency table, so the corpus
    collapses to (word, count) in ONE map-side-combinable shuffle —
    vocabulary-sized, bounded by distinct words, not corpus bytes —
    and that bounded table comes to the driver where the classic
    incremental-pair-count trainer (``bpe_train_from_freqs``) runs
    the merge loop in memory.  One distributed job total, regardless
    of ``n_merges``; the cluster is saved for the corpus-side
    segmentation join (``bpe_segment_counts``).  A one-job-per-merge
    formulation schedules ~32k Spark jobs for a real tokenizer and
    recounts every pair each round — scheduling overhead, not data,
    becomes the cost.

    ``max_vocab`` caps driver memory for pathological vocabularies —
    and the DEFAULT is a large finite cap (2M words, ~100 MB of
    driver state; the r5 verdict's ask: the default path must never
    collect an unbounded table, since a 100 TB corpus with
    pathological tokenization makes "distinct words" corpus-scale).
    The cap keeps the top-N by (count DESC, word ASC); rare words
    beyond it are excluded from the statistics, a documented coverage
    trade-off: by Zipf's law the dropped tail carries a vanishing
    share of occurrence mass, and merge decisions are count-weighted.
    When the cap actually truncates, a warning is logged so the
    trade-off is visible at runtime (r6 advice); pass
    ``max_vocab=None`` to collect the full table deliberately.
    """
    words = (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if max_vocab is not None:
        # collect cap+1 rows: an extra row proves truncation without a
        # second count job; it is the order's last row, so drop it
        rows = (
            words.orderBy(F.desc("cnt"), F.asc("word"))
            .limit(max_vocab + 1)
            .collect()
        )
        if len(rows) > max_vocab:
            rows = rows[:max_vocab]
            import logging

            logging.getLogger("pgloader_spark.text").warning(
                "bpe_learn: vocabulary exceeds max_vocab=%d; rare words "
                "beyond the cap are excluded from merge statistics "
                "(pass max_vocab=None for the unbounded table)",
                max_vocab,
            )
    else:
        rows = words.collect()
    freqs = {r["word"]: int(r["cnt"]) for r in rows}
    return bpe_train_from_freqs(freqs, n_merges, min_pair_count)


def bpe_segment_counts(
    df: DataFrame,
    merges: list[tuple[int, str, str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply learned BPE merges to the corpus: per-document subword
    stats (n_tokens, n_subwords, subwords_per_token).

    The expensive part — one greedy left-to-right pass per merge rank —
    runs on the DISTINCT-WORD table (vocabulary-sized), never per
    occurrence: a 100 TB corpus pays the 24-pass rewrite once per
    unique word, then a single word-keyed join carries each word's
    subword count back onto the exploded tokens (AQE broadcasts the
    vocab side at any realistic vocabulary).

    The per-rank pass is ONE non-overlapping string ``replace`` over a
    ``\\x1f``-delimited symbol rendering — single-``\\x1f`` guards at
    the ends, double-``\\x1f`` between symbols, so a rule can never
    match a symbol's substring and each match consumes one separator
    from each double boundary, leaving the other to guard the next
    (the DuckDB gate oracle's own construction,
    queries_pipeline._duck_bpe_frozen_sql, proven equal to the greedy
    fold).  24 merges therefore compile to one codegen'd JVM
    projection — no per-rank HOF aggregate passes, no localCheckpoint
    lineage cuts (measured 3x on the sf0.1 corpus).  Safe because BPE
    symbols are drawn from ``tokens()`` output ([a-z0-9]+ plus the
    ``</w>`` suffix) — ``\\x1f`` can never occur inside a symbol.
    """
    s1, s2 = chr(31), chr(31) * 2
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("word"))
    words = tok.select("word").distinct()
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.when(
            i == F.length("word"),
            F.concat(F.col("word").substr(i, F.lit(1)), F.lit("</w>")),
        ).otherwise(F.col("word").substr(i, F.lit(1))),
    )
    s = F.concat(F.lit(s1), F.array_join(chars, s2), F.lit(s1))
    for _rank, left, right, merged, _pc in merges:
        s = F.replace(
            s, F.lit(f"{s1}{left}{s2}{right}{s1}"), F.lit(f"{s1}{merged}{s1}")
        )
    seg = words.select("word", F.size(F.split(s, s2)).alias("n_sub"))
    return (
        tok.join(seg, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("n_sub").alias("n_subwords"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_subwords",
            F.round(
                F.col("n_subwords") / F.col("n_tokens").cast("double"), 6
            ).alias("subwords_per_token"),
        )
    )


def bm25_topk_incremental(
    corpus: DataFrame,
    batch: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qtext_col: str = "query_text",
) -> DataFrame:
    """Score a NEW document batch with a FROZEN BM25 model — the
    incremental-retrieval shape: the index snapshot (df per query
    term, N, avgdl) is computed once from the corpus and broadcast;
    scoring each arriving batch then costs O(batch), never re-reading
    the corpus.  Batch doc lengths are normalized by the SNAPSHOT's
    avgdl (frozen-model semantics — the same contract as
    dedup.incremental_dedup's frozen digest index).

    Rank stability: 6-dp-rounded score, id tiebreak.
    """
    qterms = queries.select(
        F.col(qid_col).cast("long").alias(qid_col),
        F.explode(F.array_distinct(tokens(qtext_col))).alias("term"),
    )
    cdl = corpus.select(F.size(tokens(text_col)).alias("dl")).filter(
        F.col("dl") > 0
    )
    stats = cdl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    # document frequency per QUERY term only, from the frozen corpus
    qdf = (
        corpus.select(
            F.col(id_col), F.array_distinct(tokens(text_col)).alias("tk")
        )
        .select(F.explode("tk").alias("term"))
        .join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    btok = batch.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    btf = btok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    bdl = btok.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = idf * (
        F.col("tf") * (k1 + 1.0)
        / (
            F.col("tf")
            + k1
            * (1.0 - b + b * F.col("dl").cast("double") / F.col("avgdl"))
        )
    )
    scored = (
        btf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(qdf), "term")
        .join(bdl, id_col)
        .join(F.broadcast(stats))
        .groupBy(qid_col, id_col)
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )
    rn = F.row_number().over(
        W.partitionBy(qid_col).orderBy(F.desc("score"), F.asc(id_col))
    )
    return (
        scored.withColumn("rnk", rn)
        .filter(F.col("rnk") <= k)
        .select(qid_col, id_col, "score", F.col("rnk").cast("int").alias("rnk"))
    )
