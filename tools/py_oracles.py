"""Pure-Python oracles for the four queries SQL cannot express.

``text_bpe_merges`` / ``text_bpe_tokenize`` (iterative argmax loop),
``text_classifier_train`` (iterative gradient descent) and
``embedding_pca_project`` (eigendecomposition) have no DuckDB oracle,
so the driver can only rows-check them.  This module gives the parity
harness (tools/check_parity.py) an independent reference for each:
textbook in-memory implementations that read the same parquet inputs
directly (via duckdb) and recompute the expected output from scratch —
no pgloader_spark code on the oracle side.

Each oracle returns ``(cols, rows, atol)``; ``atol`` is 0.0 where the
computation is integer/string-exact and a small float tolerance where
the reference necessarily re-runs IEEE math (libm exp / BLAS eigh) that
is only pinned to the operators' 6-to-9-dp rounding contracts.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import duckdb

TOKEN_SPLIT_RE = re.compile(r"[^a-z0-9]+")


def _toks(text: str) -> list[str]:
    return [t for t in TOKEN_SPLIT_RE.split((text or "").lower()) if t]


def _half_up(x: float, nd: int) -> float:
    """Spark's F.round / double->decimal cast semantics: HALF_UP on the
    exact decimal expansion of the IEEE double (python round() is
    banker's — NOT equivalent)."""
    return float(Decimal(x).quantize(Decimal(1).scaleb(-nd), ROUND_HALF_UP))


def _dec(x: float, nd: int) -> Decimal:
    return Decimal(x).quantize(Decimal(1).scaleb(-nd), ROUND_HALF_UP)


def _read(sf_dir: str, sql: str) -> list[tuple]:
    return duckdb.sql(sql.format(sf=sf_dir)).fetchall()


# ------------------------------------------------------------------ BPE


def _bpe_train(texts: list[str], n_merges: int, min_pair_count: int = 2):
    """Sennrich et al. 2016 get_stats/merge_vocab, recount-everything
    form (independent of the repo's incremental trainer)."""
    words = Counter(t for s in texts for t in _toks(s))
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in words.items():
        syms = tuple(list(w[:-1]) + [w[-1] + "</w>"])
        vocab[syms] = vocab.get(syms, 0) + c
    merges = []
    for rank in range(1, n_merges + 1):
        stats: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += c
        if not stats:
            break
        (left, right), pc = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        if pc < min_pair_count:
            break
        merges.append((rank, left, right, left + right, pc))
        new: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new[t] = new.get(t, 0) + c
        vocab = new
    return merges


def _bpe_segment(word: str, merges) -> list[str]:
    syms = list(word[:-1]) + [word[-1] + "</w>"]
    for _rank, left, right, merged, _pc in merges:
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def text_bpe_merges(sf_dir: str):
    texts = [r[0] for r in _read(sf_dir, "SELECT text FROM read_parquet('{sf}/documents.parquet')")]
    rows = _bpe_train(texts, n_merges=24)
    return (
        ["merge_rank", "left", "right", "merged", "pair_count"],
        rows,
        0.0,
    )


def text_bpe_tokenize(sf_dir: str):
    data = _read(
        sf_dir,
        "SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet') ORDER BY doc_id",
    )
    merges = _bpe_train([t for _, t in data], n_merges=16)
    seg_len: dict[str, int] = {}
    rows = []
    for doc_id, text in data:
        toks = _toks(text)
        if not toks:
            continue
        n_sub = 0
        for w in toks:
            if w not in seg_len:
                seg_len[w] = len(_bpe_segment(w, merges))
            n_sub += seg_len[w]
        rows.append((doc_id, len(toks), n_sub, _half_up(n_sub / len(toks), 6)))
    return (["doc_id", "n_tokens", "n_subwords", "subwords_per_token"], rows, 1e-9)


# --------------------------------------------------------- classifier


def _bucket(tok: str, seed: int, dim: int) -> int:
    h = int(hashlib.md5(f"h{seed}:{tok}".encode()).hexdigest()[:12], 16)
    return h % dim


def text_classifier_train(sf_dir: str):
    """Full-batch logistic GD mirroring train_hashed_classifier's
    declared determinism contract (decimal folds, 9-dp rounds) with
    plain-Python Decimal arithmetic."""
    dim, epochs, lr, seed = 256, 3, 2.0, 1
    data = _read(
        sf_dir,
        "SELECT doc_id, text, lang FROM read_parquet('{sf}/documents.parquet')",
    )
    docs = []  # (y, {bucket: x_dec})
    for _doc_id, text, lang in data:
        toks = _toks(text)
        if not toks:
            continue
        n = len(toks)
        cnt = Counter(_bucket(t, seed, dim) for t in toks)
        feats = {b: _dec(c / n, 9) for b, c in cnt.items()}
        docs.append((Decimal(1 if lang == "en" else 0), feats))
    n_docs = len(docs)
    w = [0.0] * dim
    bias = 0.0
    for _ in range(epochs):
        w_dec = [_dec(round(wi, 9), 9) for wi in w]
        grad = [Decimal(0)] * dim
        gb = Decimal(0)
        for y, feats in docs:
            dot = sum((x * w_dec[b] for b, x in feats.items()), Decimal(0))
            p = _half_up(1.0 / (1.0 + math.exp(-(bias + float(dot)))), 9)
            diff = _dec(p, 9) - y
            gb += diff
            for b, x in feats.items():
                grad[b] += diff * x
        w = [round(wi - lr * (float(grad[j]) / n_docs), 9) for j, wi in enumerate(w)]
        bias = round(bias - lr * float(gb) / n_docs, 9)
    rows = [(-1, float(bias))] + [(j, float(wj)) for j, wj in enumerate(w)]
    return (["bucket", "weight"], rows, 1e-6)


# ---------------------------------------------------------------- PCA


def embedding_pca_project(sf_dir: str):
    """Exact-decimal covariance (the operator's DECIMAL(38,12) fold,
    reproduced with python Decimal) -> numpy eigh -> sign-pinned
    projection."""
    import numpy as np

    k, dim = 8, 64
    data = _read(
        sf_dir,
        "SELECT vec_id, embedding FROM read_parquet('{sf}/embeddings.parquet') ORDER BY vec_id",
    )
    n = len(data)
    q12 = Decimal(1).scaleb(-12)
    sxy = [[Decimal(0)] * dim for _ in range(dim)]
    si = [Decimal(0)] * dim
    for _vid, vec in data:
        for i in range(dim):
            xi = vec[i]
            si[i] += Decimal(xi).quantize(q12, ROUND_HALF_UP)
            row = sxy[i]
            for j in range(i, dim):
                row[j] += Decimal(xi * vec[j]).quantize(q12, ROUND_HALF_UP)
    c = np.zeros((dim, dim))
    for i in range(dim):
        for j in range(i, dim):
            cov = _half_up(
                float(sxy[i][j]) / n - (float(si[i]) / n) * (float(si[j]) / n), 6
            )
            c[i, j] = c[j, i] = cov + 0.0
    vals, vecs = np.linalg.eigh(c)
    order = np.argsort(vals)[::-1][:k]
    w = vecs[:, order].T
    for r in range(k):
        m = int(np.argmax(np.abs(w[r])))
        if w[r, m] < 0:
            w[r] = -w[r]
    rows = []
    for vid, vec in data:
        pcs = []
        for r in range(k):
            s = 0.0
            for d in range(dim):  # left-assoc adds = the Column expression
                s += vec[d] * float(w[r, d])
            pcs.append(_half_up(s, 6))
        rows.append((vid, *pcs))
    return (["vec_id"] + [f"pc{r + 1}" for r in range(k)], rows, 2e-6)


PY_ORACLES = {
    "text_bpe_merges": text_bpe_merges,
    "text_bpe_tokenize": text_bpe_tokenize,
    "text_classifier_train": text_classifier_train,
    "embedding_pca_project": embedding_pca_project,
}


# ----------------------------------------------------------------- PQ


def similarity_pq_topk(sf_dir: str):
    """Independent numpy product-quantization reference: same spec as
    operators/similarity.py (first-256-by-id sample, first-16-distinct
    6dp init, 5 Lloyd rounds with 6dp-rounded centroids and argmin on
    6dp-rounded distances), per-vector loops instead of the engine's
    gemm expansion."""
    import numpy as np

    m, ks, sample_n, iters, dim, k = 16, 64, 500, 5, 64, 10
    dsub = dim // m
    data = _read(
        sf_dir,
        "SELECT vec_id, embedding FROM read_parquet('{sf}/embeddings.parquet') ORDER BY vec_id",
    )
    ids = np.array([r[0] for r in data], dtype=np.int64)
    V = np.array([r[1] for r in data], dtype=np.float64)

    codebooks = []
    sample = V[:sample_n]
    for s in range(m):
        X = sample[:, s * dsub : (s + 1) * dsub]
        seen: dict = {}
        for v in np.round(X, 6):
            t = tuple(v)
            if t not in seen:
                seen[t] = None
            if len(seen) == ks:
                break
        C = np.array(list(seen), dtype=np.float64)
        for _ in range(iters):
            d2 = np.array(
                [[((x - c) ** 2).sum() for c in C] for x in X]
            )
            assign = np.argmin(np.round(d2, 6), axis=1)
            for c in range(ks):
                mask = assign == c
                if mask.any():
                    C[c] = np.round(X[mask].mean(axis=0), 6)
        codebooks.append(C)

    codes = np.empty((len(V), m), dtype=np.int64)
    for s, C in enumerate(codebooks):
        X = V[:, s * dsub : (s + 1) * dsub]
        d2 = np.array([[((x - c) ** 2).sum() for c in C] for x in X])
        codes[:, s] = np.argmin(np.round(d2, 6), axis=1)

    rows = []
    for qi in range(len(ids)):
        if ids[qi] % 50 != 0:
            continue
        luts = []
        for s, C in enumerate(codebooks):
            xs = V[qi, s * dsub : (s + 1) * dsub]
            luts.append(np.round(((C - xs[None, :]) ** 2).sum(axis=1), 6))
        cand = []
        for ni in range(len(ids)):
            if ni == qi:
                continue
            a = 0.0
            for s in range(m):
                a += float(luts[s][codes[ni, s]])
            cand.append((_half_up(a, 6), int(ids[ni])))
        cand.sort()
        for rnk, (a, nid) in enumerate(cand[:k], 1):
            rows.append((int(ids[qi]), nid, a, rnk))
    return (["q_id", "n_id", "adist", "rank"], rows, 2e-6)


PY_ORACLES["similarity_pq_topk"] = similarity_pq_topk


def _np_lloyd(X, ks, iters):
    """Same deterministic Lloyd spec, independent per-vector-loop impl."""
    import numpy as np

    seen: dict = {}
    for v in np.round(X, 6):
        t = tuple(v)
        if t not in seen:
            seen[t] = None
        if len(seen) == ks:
            break
    C = np.array(list(seen), dtype=np.float64)
    for _ in range(iters):
        d2 = np.array([[((x - c) ** 2).sum() for c in C] for x in X])
        assign = np.argmin(np.round(d2, 6), axis=1)
        for c in range(ks):
            mask = assign == c
            if mask.any():
                C[c] = np.round(X[mask].mean(axis=0), 6)
    return C


def similarity_ivfpq_topk(sf_dir: str):
    """Independent numpy IVF-PQ reference: coarse Lloyd quantizer,
    residual PQ codebooks, n_probe=2 cell pruning, ADC ranking."""
    import numpy as np

    n_cells, m, ks, sample_n, iters, dim, k, n_probe = 8, 16, 64, 500, 5, 64, 10, 2
    dsub = dim // m
    data = _read(
        sf_dir,
        "SELECT vec_id, embedding FROM read_parquet('{sf}/embeddings.parquet') ORDER BY vec_id",
    )
    ids = np.array([r[0] for r in data], dtype=np.int64)
    V = np.array([r[1] for r in data], dtype=np.float64)

    sample = V[:sample_n]
    CO = _np_lloyd(sample, n_cells, iters)
    d2s = np.array([[((x - c) ** 2).sum() for c in CO] for x in sample])
    res = sample - CO[np.argmin(np.round(d2s, 6), axis=1)]
    codebooks = [
        _np_lloyd(res[:, s * dsub : (s + 1) * dsub], ks, iters) for s in range(m)
    ]

    d2 = np.array([[((x - c) ** 2).sum() for c in CO] for x in V])
    cell = np.argmin(np.round(d2, 6), axis=1)
    R = V - CO[cell]
    codes = np.empty((len(V), m), dtype=np.int64)
    for s, C in enumerate(codebooks):
        X = R[:, s * dsub : (s + 1) * dsub]
        sd2 = np.array([[((x - c) ** 2).sum() for c in C] for x in X])
        codes[:, s] = np.argmin(np.round(sd2, 6), axis=1)

    rows = []
    for qi in range(len(ids)):
        if ids[qi] % 50 != 0:
            continue
        qd = np.round(((CO - V[qi][None, :]) ** 2).sum(axis=1), 6)
        probe = np.argsort(qd, kind="stable")[:n_probe]
        cand = []
        for c in probe:
            r = V[qi] - CO[c]
            luts = [
                np.round(
                    ((np.array(codebooks[s]) - r[s * dsub : (s + 1) * dsub][None, :])
                     ** 2).sum(axis=1),
                    6,
                )
                for s in range(m)
            ]
            for ni in np.flatnonzero(cell == c):
                if ni == qi:
                    continue
                a = 0.0
                for s in range(m):
                    a += float(luts[s][codes[ni, s]])
                cand.append((_half_up(a, 6), int(ids[ni])))
        cand.sort()
        for rnk, (a, nid) in enumerate(cand[:k], 1):
            rows.append((int(ids[qi]), nid, a, rnk))
    return (["q_id", "n_id", "adist", "rank"], rows, 2e-6)


PY_ORACLES["similarity_ivfpq_topk"] = similarity_ivfpq_topk


def similarity_pq_quality(sf_dir: str):
    """Recall@10 of the PQ reference ranking vs exact L2 truth."""
    import numpy as np

    cols, pq_rows, _ = similarity_pq_topk(sf_dir)
    approx: dict[int, set] = {}
    for q_id, n_id, _a, _r in pq_rows:
        approx.setdefault(q_id, set()).add(n_id)

    data = _read(
        sf_dir,
        "SELECT vec_id, embedding FROM read_parquet('{sf}/embeddings.parquet') ORDER BY vec_id",
    )
    ids = np.array([r[0] for r in data], dtype=np.int64)
    V = np.array([r[1] for r in data], dtype=np.float64)
    rows = []
    for qi in range(len(ids)):
        if ids[qi] % 50 != 0:
            continue
        cand = []
        for ni in range(len(ids)):
            if ni == qi:
                continue
            d = V[qi] - V[ni]
            cand.append((_half_up(float((d * d).sum()), 6), int(ids[ni])))
        cand.sort()
        truth = {nid for _d, nid in cand[:10]}
        hits = len(truth & approx.get(int(ids[qi]), set()))
        rows.append((int(ids[qi]), _half_up(hits / 10.0, 4)))
    return (["q_id", "recall_at_10"], rows, 1e-9)


PY_ORACLES["similarity_pq_quality"] = similarity_pq_quality


def similarity_ivfpq_quality(sf_dir: str):
    """Recall@10 of the IVF-PQ reference ranking vs exact L2 truth."""
    import numpy as np

    cols, rows_pq, _ = similarity_ivfpq_topk(sf_dir)
    approx: dict[int, set] = {}
    for q_id, n_id, _a, _r in rows_pq:
        approx.setdefault(q_id, set()).add(n_id)

    data = _read(
        sf_dir,
        "SELECT vec_id, embedding FROM read_parquet('{sf}/embeddings.parquet') ORDER BY vec_id",
    )
    ids = np.array([r[0] for r in data], dtype=np.int64)
    V = np.array([r[1] for r in data], dtype=np.float64)
    rows = []
    for qi in range(len(ids)):
        if ids[qi] % 50 != 0:
            continue
        cand = []
        for ni in range(len(ids)):
            if ni == qi:
                continue
            d = V[qi] - V[ni]
            cand.append((_half_up(float((d * d).sum()), 6), int(ids[ni])))
        cand.sort()
        truth = {nid for _d, nid in cand[:10]}
        hits = len(truth & approx.get(int(ids[qi]), set()))
        rows.append((int(ids[qi]), _half_up(hits / 10.0, 4)))
    return (["q_id", "recall_at_10"], rows, 1e-9)


PY_ORACLES["similarity_ivfpq_quality"] = similarity_ivfpq_quality
