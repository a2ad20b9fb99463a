"""Independent sf0.1 verification of the closure-family dedup queries
(r10): dedup_token_jaccard, dedup_containment, dedup_shingle_jaccard.

These are the registry entries whose DuckDB oracles (recursive-CTE
transitive closures / full shared-shingle scans) cannot finish at
sf0.1 — the oracle is the bottleneck, not the engine — so bench-scale
correctness evidence comes from THIS tool instead: a from-scratch
numpy/python model with no shared code or algorithmic structure with
the engine (no PPJoin, no prefix filter, no clone collapse — dense
set-intersection matmuls over one-hot matrices and a plain union-find),
compared value-for-value against the Spark output at sf0.1.

Model:
- tokens  = re.split('[^a-z0-9]+', lower) non-empty  (mirrors
  operators/text.py:TOKEN_SPLIT_RE; pinned by tests)
- shingles = k-word windows joined by ' ' (whole stream when < k)
- intersections: X @ X.T over float32 one-hot (counts < 2^24 => exact),
  divisions in float64 (same IEEE arithmetic as Spark doubles),
  HALF_UP 6dp rounding (floor(x*1e6 + 0.5)/1e6 — Spark F.round mode).
- token_jaccard clusters: union-find over >=t edges between distinct
  token SETS, clusters weighted by identical-set group sizes,
  canonical = min doc id, emitted when n_docs >= 2.

The engine hashes items to 60-bit ints before set ops (Jaccard is
invariant under an injective item map); this model uses the raw
strings — a hash collision would surface here as a value mismatch.

Usage: python tools/verify_dedup_sf01.py [sf_dir] [artifact]
"""

from __future__ import annotations

import math
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from tools.run_bench_artifact import write_atomic  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ARTIFACT = sys.argv[2] if len(sys.argv) > 2 else (
    "tools/profiles/dedup_numpy_check_sf01_r10.json"
)


def r6(x: float) -> float:
    """HALF_UP 6dp — Spark's F.round mode for positive doubles."""
    return math.floor(x * 1e6 + 0.5) / 1e6


def py_tokens(s: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def py_shingles(tk: list[str], k: int) -> frozenset:
    if len(tk) < k:
        return frozenset({" ".join(tk)})
    return frozenset(
        " ".join(tk[i : i + k]) for i in range(len(tk) - k + 1)
    )


def one_hot(sets: list[frozenset]) -> np.ndarray:
    vocab: dict[str, int] = {}
    for s in sets:
        for it in s:
            vocab.setdefault(it, len(vocab))
    X = np.zeros((len(sets), len(vocab)), dtype=np.float32)
    for i, s in enumerate(sets):
        for it in s:
            X[i, vocab[it]] = 1.0
    return X


def inter_matrix(X: np.ndarray, chunk: int = 40_000) -> np.ndarray:
    """X @ X.T accumulated over item-axis chunks (bounds the BLAS
    working set; float32 counts stay exact below 2^24)."""
    n = X.shape[0]
    G = np.zeros((n, n), dtype=np.float64)
    for c0 in range(0, X.shape[1], chunk):
        Xc = X[:, c0 : c0 + chunk]
        G += (Xc @ Xc.T).astype(np.float64)
    return G


class UF:
    def __init__(self, n):
        self.p = list(range(n))

    def find(self, a):
        while self.p[a] != a:
            self.p[a] = self.p[self.p[a]]
            a = self.p[a]
        return a

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def main() -> int:
    import duckdb

    t0 = time.perf_counter()
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{SF_DIR}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    ids = [int(r[0]) for r in rows]
    toks = [py_tokens(r[1]) for r in rows]
    tok_sets = [frozenset(t) for t in toks]
    sh_sets = [py_shingles(t, 3) for t in toks]
    report: dict = {"sf_dir": SF_DIR, "docs": len(ids)}

    # ---- model: token-jaccard clusters (threshold 0.8) ----
    groups: dict[frozenset, list[int]] = {}
    for i, s in enumerate(tok_sets):
        groups.setdefault(s, []).append(i)
    reps = sorted(groups.values(), key=lambda m: ids[m[0]])
    rep_sets = [tok_sets[m[0]] for m in reps]
    rep_ids = [min(ids[i] for i in m) for m in reps]
    rep_gsize = [len(m) for m in reps]
    Xt = one_hot(rep_sets)
    Gt = inter_matrix(Xt)
    nt = np.array([len(s) for s in rep_sets], dtype=np.float64)
    uf = UF(len(reps))
    union = nt[:, None] + nt[None, :] - Gt
    with np.errstate(divide="ignore", invalid="ignore"):
        J = np.where(union > 0, Gt / union, 0.0)
    ii, jj = np.nonzero(np.triu(J, 1) > 0)
    for a, b in zip(ii, jj):
        if r6(float(J[a, b])) >= 0.8:
            uf.union(int(a), int(b))
    comp: dict[int, list[int]] = {}
    for i in range(len(reps)):
        comp.setdefault(uf.find(i), []).append(i)
    model_clusters = sorted(
        (min(rep_ids[i] for i in m), sum(rep_gsize[i] for i in m))
        for m in comp.values()
        if sum(rep_gsize[i] for i in m) >= 2
    )

    # ---- model: shingle matrices (shared by containment + jaccard) ----
    Xs = one_hot(sh_sets)
    report["shingle_vocab"] = int(Xs.shape[1])
    Gs = inter_matrix(Xs)
    ns = np.array([len(s) for s in sh_sets], dtype=np.float64)

    model_containment = set()
    C = Gs / ns[:, None]  # containment of row-doc IN column-doc
    ai, bi = np.nonzero(C >= 0.6 - 1e-9)
    for a, b in zip(ai, bi):
        if a == b:
            continue
        c = r6(float(C[a, b]))
        if c >= 0.6:
            model_containment.add(
                (ids[a], ids[b], int(Gs[a, b]), c)
            )

    model_jaccard = set()
    unions = ns[:, None] + ns[None, :] - Gs
    with np.errstate(divide="ignore", invalid="ignore"):
        Js = np.where(unions > 0, Gs / unions, 0.0)
    ai, bi = np.nonzero(np.triu(Js, 1) >= 0.5 - 1e-9)
    for a, b in zip(ai, bi):
        j = r6(float(Js[a, b]))
        if j >= 0.5:
            model_jaccard.add((ids[a], ids[b], j))
    report["model_secs"] = round(time.perf_counter() - t0, 1)

    # ---- engine side ----
    from pgloader_spark.queries import QUERIES
    from pgloader_spark.session import get_spark

    spark = get_spark("dedup_numpy_check")
    spark.sparkContext.setLogLevel("ERROR")
    eng_clusters = sorted(
        (int(r[0]), int(r[1]))
        for r in QUERIES["dedup_token_jaccard"](spark, SF_DIR).collect()
    )
    eng_containment = {
        (int(r[0]), int(r[1]), int(r[2]), float(r[3]))
        for r in QUERIES["dedup_containment"](spark, SF_DIR).collect()
    }
    eng_jaccard = {
        (min(int(r[0]), int(r[1])), max(int(r[0]), int(r[1])), float(r[2]))
        for r in QUERIES["dedup_shingle_jaccard"](spark, SF_DIR).collect()
    }
    spark.stop()

    checks = {
        "token_jaccard_clusters": {
            "model": len(model_clusters),
            "engine": len(eng_clusters),
            "match": model_clusters == eng_clusters,
        },
        "containment_pairs": {
            "model": len(model_containment),
            "engine": len(eng_containment),
            "match": model_containment == eng_containment,
        },
        "shingle_jaccard_pairs": {
            "model": len(model_jaccard),
            "engine": len(eng_jaccard),
            "match": model_jaccard == eng_jaccard,
        },
    }
    report["checks"] = checks
    report["all_match"] = all(c["match"] for c in checks.values())
    for name, c in checks.items():
        print(name, c, flush=True)
    write_atomic(ARTIFACT, report)
    print(f"wrote {ARTIFACT}: all_match={report['all_match']}")
    return 0 if report["all_match"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
