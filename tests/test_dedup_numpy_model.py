"""The independent numpy dedup model (tools/verify_dedup_sf01.py) as a
continuous regression: at sf0.001 it must agree value-for-value with
the engine's closure-family queries.  This is the model that carries
bench-scale (sf0.1) correctness evidence for the three queries whose
DuckDB closure oracles are intractable there — so the model itself is
pinned against the engine (and, transitively, against the DuckDB
oracles that DO run at sf0.001/sf0.01) on every suite run."""

import importlib.util
import pathlib
import sys

SF_DIR = "/root/testdata/sf0.001"


def _tool():
    root = pathlib.Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "verify_dedup_sf01", root / "tools" / "verify_dedup_sf01.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("verify_dedup_sf01", mod)
    spec.loader.exec_module(mod)
    return mod


def test_numpy_model_matches_engine_at_sf0001(spark):
    import duckdb
    import numpy as np

    m = _tool()
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{SF_DIR}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    ids = [int(r[0]) for r in rows]
    toks = [m.py_tokens(r[1]) for r in rows]
    tok_sets = [frozenset(t) for t in toks]
    sh_sets = [m.py_shingles(t, 3) for t in toks]

    # model: token-jaccard clusters
    groups = {}
    for i, s in enumerate(tok_sets):
        groups.setdefault(s, []).append(i)
    reps = sorted(groups.values(), key=lambda mm: ids[mm[0]])
    rep_sets = [tok_sets[mm[0]] for mm in reps]
    rep_ids = [min(ids[i] for i in mm) for mm in reps]
    rep_gsize = [len(mm) for mm in reps]
    Xt = m.one_hot(rep_sets)
    Gt = m.inter_matrix(Xt)
    nt = np.array([len(s) for s in rep_sets], dtype=np.float64)
    uf = m.UF(len(reps))
    union = nt[:, None] + nt[None, :] - Gt
    with np.errstate(divide="ignore", invalid="ignore"):
        J = np.where(union > 0, Gt / union, 0.0)
    for a, b in zip(*np.nonzero(np.triu(J, 1) > 0)):
        if m.r6(float(J[a, b])) >= 0.8:
            uf.union(int(a), int(b))
    comp = {}
    for i in range(len(reps)):
        comp.setdefault(uf.find(i), []).append(i)
    model_clusters = sorted(
        (min(rep_ids[i] for i in mm), sum(rep_gsize[i] for i in mm))
        for mm in comp.values()
        if sum(rep_gsize[i] for i in mm) >= 2
    )

    # model: containment (0.6) + shingle jaccard (0.5)
    Xs = m.one_hot(sh_sets)
    Gs = m.inter_matrix(Xs)
    ns = np.array([len(s) for s in sh_sets], dtype=np.float64)
    C = Gs / ns[:, None]
    model_cont = set()
    for a, b in zip(*np.nonzero(C >= 0.6 - 1e-9)):
        if a != b and m.r6(float(C[a, b])) >= 0.6:
            model_cont.add((ids[a], ids[b], int(Gs[a, b]),
                            m.r6(float(C[a, b]))))
    unions = ns[:, None] + ns[None, :] - Gs
    with np.errstate(divide="ignore", invalid="ignore"):
        Js = np.where(unions > 0, Gs / unions, 0.0)
    model_jac = set()
    for a, b in zip(*np.nonzero(np.triu(Js, 1) >= 0.5 - 1e-9)):
        if m.r6(float(Js[a, b])) >= 0.5:
            model_jac.add((ids[a], ids[b], m.r6(float(Js[a, b]))))

    from pgloader_spark.queries import QUERIES

    eng_clusters = sorted(
        (int(r[0]), int(r[1]))
        for r in QUERIES["dedup_token_jaccard"](spark, SF_DIR).collect()
    )
    eng_cont = {
        (int(r[0]), int(r[1]), int(r[2]), float(r[3]))
        for r in QUERIES["dedup_containment"](spark, SF_DIR).collect()
    }
    eng_jac = {
        (min(int(r[0]), int(r[1])), max(int(r[0]), int(r[1])), float(r[2]))
        for r in QUERIES["dedup_shingle_jaccard"](spark, SF_DIR).collect()
    }
    assert model_clusters == eng_clusters
    assert model_cont == eng_cont
    assert model_jac == eng_jac
