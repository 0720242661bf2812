"""MatchServer full-match-set semantics + faceted search
(engine/query/engine.py::MatchServer, engine/pipelines.py::ft_bm25_facets)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from engine.core.dockey import doc_key_batch
from engine.index.build import build_index
from engine.io.synth import synth_transcripts_table
from engine.oracle.bm25 import BM25Oracle
from engine.query.engine import MatchServer


@pytest.fixture(scope="module")
def env(tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("facets")
    t = synth_transcripts_table(30, seed=31)
    corpus = str(tmp / "c.parquet")
    pq.write_table(t, corpus)
    idx = str(tmp / "idx")
    build_index(corpus, idx, num_shards=4, build_id="fc")
    keys = doc_key_batch(t["conv_id"], t["turn_idx"].to_numpy())
    oracle = BM25Oracle(list(keys), t["text"].to_pylist())
    return idx, oracle


def _expected_matches(oracle, text):
    terms = sorted(set(oracle.analyzer.tokens(text)))
    idxs = [oracle.postings[t][0] for t in terms if t in oracle.postings]
    if not idxs:
        return np.empty(0, dtype=np.int64)
    return np.sort(oracle.doc_keys[np.unique(np.concatenate(idxs))])


def test_match_server_full_set(env):
    idx, oracle = env
    srv = MatchServer(idx)
    vocab = sorted(oracle.postings, key=lambda t: -len(oracle.postings[t][0]))
    text = f"{vocab[0]} {vocab[5]}"
    out = srv(pa.table({"qid": pa.array([0], pa.int64()),
                        "text": pa.array([text], pa.string())}))
    got = np.sort(out["doc_key"].to_numpy())
    np.testing.assert_array_equal(got, _expected_matches(oracle, text))


def test_match_server_boolean_gate(env):
    idx, oracle = env
    vocab = sorted(oracle.postings, key=lambda t: -len(oracle.postings[t][0]))
    a, b = vocab[0], vocab[1]
    srv = MatchServer(idx, boolean=True)
    out = srv(pa.table({"qid": pa.array([0], pa.int64()),
                        "text": pa.array([f"+{a} +{b}"], pa.string())}))
    got = np.sort(out["doc_key"].to_numpy())
    # expected: docs containing BOTH terms
    ka = oracle.doc_keys[oracle.postings[a][0]]
    kb = oracle.doc_keys[oracle.postings[b][0]]
    np.testing.assert_array_equal(got, np.intersect1d(ka, kb))


def test_match_server_respects_deletes(env):
    from engine.index.deletes import delete_doc_keys

    idx, oracle = env
    vocab = sorted(oracle.postings, key=lambda t: -len(oracle.postings[t][0]))
    text = vocab[0]
    pre = _expected_matches(oracle, text)
    delete_doc_keys(idx, pre[:3], delete_id="fc-del")
    srv = MatchServer(idx)
    out = srv(pa.table({"qid": pa.array([0], pa.int64()),
                        "text": pa.array([text], pa.string())}))
    got = np.sort(out["doc_key"].to_numpy())
    np.testing.assert_array_equal(got, pre[3:])


def test_ft_bm25_snippets_windows(ray_session):
    """Snippet = ±window tokens around the FIRST occurrence of any query
    term, recomputed independently; edge clamping at doc start/end."""
    from engine.pipelines import DOC_QUERIES, ft_bm25_snippets
    from engine.text.analyzer import Analyzer

    sf = "/root/testdata/sf0.001"
    w = 5
    out = ft_bm25_snippets(sf, k=10, window=w)
    docs = pq.read_table(f"{sf}/documents.parquet").to_pandas().set_index("doc_id")
    an = Analyzer()
    qterms = dict((q, set(an.tokens(t))) for q, t in DOC_QUERIES)
    assert len(out) and (out["snippet"].str.len() > 0).all()
    for r in out.itertuples():
        ts = an.tokens(docs.loc[int(r.doc_id), "text"])
        i = next(j for j, t in enumerate(ts) if t in qterms[int(r.qid)])
        assert r.snippet == " ".join(ts[max(0, i - w): i + w + 1])
        # the snippet contains the hit term and respects the window bound
        assert len(r.snippet.split()) <= 2 * w + 1


def test_ft_more_like_this_semantics(ray_session):
    """Seed never appears in its own results; every result shares >=1 of the
    seed's selected terms; ranks are dense from 1."""
    from engine.pipelines import MLT_SEEDS, ft_more_like_this

    out = ft_more_like_this("/root/testdata/sf0.001", k=10)
    assert set(out["qid"]) <= set(MLT_SEEDS)
    assert (out["doc_id"] != out["qid"]).all()
    for qid, g in out.groupby("qid"):
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert (g["score_micro"] > 0).all()


def test_ft_term_suggest_semantics(ray_session):
    from engine.pipelines import ft_term_suggest

    out = ft_term_suggest("/root/testdata/sf0.001", prefixes=("s", "zz"), k=3)
    s = out[out["prefix"] == "s"]
    assert len(s) and s["term"].str.startswith("s").all()
    # df desc, term asc ordering
    assert (s["df"].diff().dropna() <= 0).all()
    assert not len(out[out["prefix"] == "zz"])  # no vocab hit → no rows


def test_ft_bm25_facets_counts(ray_session):
    """End-to-end facet pipeline at sf0.001 vs a pandas recomputation."""
    import pandas as pd

    from engine.pipelines import DOC_QUERIES, ft_bm25_facets
    from engine.text.analyzer import Analyzer

    sf = "/root/testdata/sf0.001"
    out = ft_bm25_facets(sf)
    docs = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    an = Analyzer()
    tok = {int(r.doc_id): set(an.tokens(r.text)) for r in docs.itertuples()}
    attrs = docs.set_index("doc_id")[["source", "lang"]]
    rows = []
    for qid, text in DOC_QUERIES:
        terms = set(an.tokens(text))
        matched = [d for d, ts in tok.items() if ts & terms]
        for f in ("source", "lang"):
            vc = attrs.loc[matched, f].value_counts()
            for v, n in vc.items():
                rows.append({"qid": qid, "facet": f, "value": v, "n_matches": n})
    exp = (
        pd.DataFrame(rows)
        .sort_values(["qid", "facet", "value"])
        .reset_index(drop=True)
        .astype({"qid": "int64", "n_matches": "int64"})
    )
    pd.testing.assert_frame_equal(out, exp, check_like=True)


def test_within_edit1_matches_dp():
    """_within_edit1 agrees with a reference Levenshtein DP (the DuckDB
    semantics the fuzzy oracle uses: transposition = 2 edits)."""
    import itertools

    from engine.pipelines import _within_edit1

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    words = ["", "a", "ab", "abc", "acb", "join", "jon", "jion", "joinn",
             "low", "row", "slow", "scan", "scann", "stream", "stram"]
    for a, b in itertools.product(words, repeat=2):
        assert _within_edit1(a, b) == (lev(a, b) <= 1), (a, b)


def test_ft_bm25_fuzzy_expansion_semantics(ray_session):
    """Fuzzy retrieval at sf0.001: every returned doc must contain at least
    one term within edit distance 1 of a fuzzy token (or a literal token),
    and the multi-expansion probe must behave like its expanded disjunction."""
    from engine.pipelines import FUZZY_QUERIES, _within_edit1, ft_bm25_fuzzy
    from engine.text.analyzer import Analyzer

    sf = "/root/testdata/sf0.001"
    out = ft_bm25_fuzzy(sf, k=10)
    docs = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    an = Analyzer()
    tok = {int(r.doc_id): set(an.tokens(r.text)) for r in docs.itertuples()}
    for qid, qtext in FUZZY_QUERIES:
        lits = {t for t in qtext.split() if not t.endswith("~")}
        probes = [t.rstrip("~") for t in qtext.split() if t.endswith("~")]
        g = out[out["qid"] == qid]
        for d in g["doc_id"]:
            ts = tok[int(d)]
            hit = bool(ts & lits) or any(
                _within_edit1(p, t) for p in probes for t in ts
            )
            assert hit, (qid, d)
    # qid 2 ("low~") must retrieve docs for BOTH expansions row and slow
    g2 = {int(d) for d in out.loc[out["qid"] == 2, "doc_id"]}
    assert any("row" in tok[d] for d in g2)
    assert any("slow" in tok[d] for d in g2)


def test_ft_hit_count_vs_pandas(ray_session):
    """Hit counts + exact distinct-source counts at sf0.001 vs a pandas
    recomputation of the same OR-match semantics."""
    import pandas as pd

    from engine.pipelines import DOC_QUERIES, ft_hit_count
    from engine.text.analyzer import Analyzer

    sf = "/root/testdata/sf0.001"
    out = ft_hit_count(sf)
    docs = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    an = Analyzer()
    tok = {int(r.doc_id): set(an.tokens(r.text)) for r in docs.itertuples()}
    src = docs.set_index("doc_id")["source"]
    rows = []
    for qid, text in DOC_QUERIES:
        terms = set(an.tokens(text))
        matched = [d for d, ts in tok.items() if ts & terms]
        if matched:
            rows.append(
                {
                    "qid": qid,
                    "n_matches": len(matched),
                    "n_sources": src.loc[matched].nunique(),
                }
            )
    exp = (
        pd.DataFrame(rows)
        .sort_values("qid")
        .reset_index(drop=True)
        .astype({"qid": "int64", "n_matches": "int64", "n_sources": "int64"})
    )
    pd.testing.assert_frame_equal(out, exp)


def test_ft_bm25_boosted_terms_vs_oracle(ray_session):
    """Term boosting at sf0.001 vs an independent recomputation: the
    BM25Oracle scores the plain query per term, boosted terms scale by
    their exact power-of-two boost, micro-rounded (score desc, doc_id asc)
    top-k must match the engine rows exactly."""
    import pandas as pd

    from engine.oracle.bm25 import BM25Oracle, idf, tf_sat
    from engine.pipelines import BOOST_QUERIES, ft_bm25_boosted_terms
    from engine.text.analyzer import Analyzer

    sf = "/root/testdata/sf0.001"
    k = 10
    out = ft_bm25_boosted_terms(sf, k=k)
    docs = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    an = Analyzer()
    oracle = BM25Oracle(docs["doc_id"].tolist(), docs["text"].tolist())
    rows = []
    for qid, qtext in BOOST_QUERIES:
        bm: dict[str, float] = {}
        terms = []
        for tok in qtext.split():
            if "^" in tok:
                t, _, b = tok.rpartition("^")
                for at in an.tokens(t):
                    bm[at] = float(b)
                terms.extend(an.tokens(t))
            else:
                terms.extend(an.tokens(tok))
        scores = np.zeros(len(oracle.doc_keys))
        matched = np.zeros(len(oracle.doc_keys), dtype=bool)
        for t in sorted(set(terms)):
            sc = oracle.score_query(t)
            scores += sc * bm.get(t, 1.0)
            matched |= sc != 0
        nz = np.nonzero(matched)[0]
        micro = np.floor(scores[nz] * 1e6 + 0.5).astype(np.int64)
        order = np.lexsort((oracle.doc_keys[nz], -micro))[:k]
        for rk, j in enumerate(order, 1):
            rows.append({"qid": qid, "rank": rk,
                         "doc_id": int(oracle.doc_keys[nz][j]),
                         "score_micro": int(micro[j])})
    exp = pd.DataFrame(rows).astype("int64")
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True)
    )


def test_ft_bm25_msm_semantics(ray_session):
    """minimum_should_match at sf0.001: every hit matches >= msm distinct
    query terms, hits are exactly the BM25 ranking restricted to qualifying
    docs, and msm=1 degenerates to the plain OR top-k."""
    import pandas as pd

    from engine.pipelines import MSM_QUERIES, _run_doc_queries, ft_bm25_msm
    from engine.text.analyzer import Analyzer

    sf = "/root/testdata/sf0.001"
    out = ft_bm25_msm(sf, k=10, msm=2)
    docs = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    an = Analyzer()
    tok = {int(r.doc_id): set(an.tokens(r.text)) for r in docs.itertuples()}
    for qid, text in MSM_QUERIES:
        terms = set(an.tokens(text))
        g = out[out["qid"] == qid]
        for d in g["doc_id"]:
            assert len(tok[int(d)] & terms) >= 2, (qid, d)
    # qid 4 is single-term: unreachable under msm=2
    assert not len(out[out["qid"] == 4])
    # msm=1 == plain OR ranking
    items = [{"qid": q, "text": t} for q, t in MSM_QUERIES]
    plain = _run_doc_queries(sf, items, 10)
    m1 = ft_bm25_msm(sf, k=10, msm=1)
    pd.testing.assert_frame_equal(m1, plain)


def test_min_pos_gap_vs_outer_product():
    """_min_pos_gap (searchsorted nearest-neighbour) equals the brute-force
    |a|x|b| outer-product minimum on random sorted position arrays."""
    from engine.pipelines import _min_pos_gap

    rng = np.random.default_rng(7)
    for _ in range(200):
        a = np.unique(rng.integers(0, 60, size=rng.integers(0, 8)))
        b = np.unique(rng.integers(0, 60, size=rng.integers(0, 8)))
        got = _min_pos_gap(a, b)
        if a.size and b.size:
            exp = int(np.abs(a[:, None] - b[None, :]).min())
        else:
            exp = np.iinfo(np.int64).max
        assert got == exp, (a, b, got, exp)


def test_ft_bm25_proximity_semantics(ray_session):
    """Proximity hits at sf0.001: every hit's min token gap really is
    <= slop + 1 (recomputed from raw text), every conjunctive match that
    satisfies the gap IS a hit (before the k cut), and hits are ranked by
    the same scores as plain conjunctive retrieval."""
    import pandas as pd

    from engine.pipelines import (PROX_QUERIES, _min_pos_gap,
                                  _run_doc_queries, ft_bm25_proximity)
    from engine.text.analyzer import Analyzer

    sf = "/root/testdata/sf0.001"
    big_k = 1_000_000
    out = ft_bm25_proximity(sf, k=big_k)
    docs = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    an = Analyzer()
    toks = {int(r.doc_id): np.asarray(an.tokens(r.text), dtype=object)
            for r in docs.itertuples()}

    cand = _run_doc_queries(
        sf, [{"qid": q, "text": f"{a} {b}"} for q, a, b, _ in PROX_QUERIES],
        big_k, conjunctive=True)
    expected = set()
    for qid, a, b, slop in PROX_QUERIES:
        for d in cand[cand["qid"] == qid]["doc_id"]:
            tk = toks[int(d)]
            gap = _min_pos_gap(np.flatnonzero(tk == a), np.flatnonzero(tk == b))
            if gap <= slop + 1:
                expected.add((qid, int(d)))
    got = set(map(tuple, out[["qid", "doc_id"]].values))
    assert got == expected
    # scores identical to the conjunctive scores for the same (qid, doc)
    merged = out.merge(cand, on=["qid", "doc_id"], suffixes=("", "_cand"))
    assert len(merged) == len(out)
    assert (merged["score_micro"] == merged["score_micro_cand"]).all()
    # at least one query must have dropped a conjunctive match (slop bites)
    assert len(out) < len(cand)


def test_ft_bm25_explain_consistency(ray_session):
    """Explain rows cover exactly the top-k hits, tf matches a direct
    recount, and each hit's contributions sum back to its ranked score
    (raw-float re-derivation, micro-rounded once like the engine)."""
    import pandas as pd

    from engine.index.build import ensure_term_stats
    from engine.io.manifest import Manifest
    from engine.oracle.bm25 import idf, tf_sat
    from engine.pipelines import (DOC_QUERIES, documents_index,
                                  ft_bm25_explain, ft_bm25_topk)
    from engine.text.analyzer import Analyzer

    sf = "/root/testdata/sf0.001"
    k = 5
    ex = ft_bm25_explain(sf, k=k)
    top = ft_bm25_topk(sf, k=k)
    assert set(map(tuple, ex[["qid", "doc_id"]].drop_duplicates().values)) == set(
        map(tuple, top[["qid", "doc_id"]].values)
    )
    docs = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    an = Analyzer()
    toks = {int(r.doc_id): an.tokens(r.text) for r in docs.itertuples()}
    idx = documents_index(sf)
    dfs = (
        pq.read_table(ensure_term_stats(idx), columns=["term", "df"])
        .to_pandas()
        .set_index("term")["df"]
    )
    st = Manifest(idx).stats
    score = top.set_index(["qid", "doc_id"])["score_micro"]
    for (qid, doc), g in ex.groupby(["qid", "doc_id"]):
        dt = toks[int(doc)]
        total = 0.0
        for r in g.itertuples():
            assert dt.count(r.term) == r.tf, (qid, doc, r.term)
            total += float(idf(int(st["n_docs"]), int(dfs[r.term]))) * float(
                tf_sat(r.tf, len(dt), float(st["avgdl"]))
            )
        assert int(np.floor(total * 1e6 + 0.5)) == int(score.loc[(qid, doc)])


def test_ft_match_stats_vs_pandas(ray_session):
    """Stats agg over match sets at sf0.001 vs a pandas recomputation."""
    import pandas as pd

    from engine.pipelines import DOC_QUERIES, ft_match_stats
    from engine.text.analyzer import Analyzer

    sf = "/root/testdata/sf0.001"
    out = ft_match_stats(sf)
    docs = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    an = Analyzer()
    tok = {int(r.doc_id): set(an.tokens(r.text)) for r in docs.itertuples()}
    nchars = docs.set_index("doc_id")["n_chars"]
    rows = []
    for qid, text in DOC_QUERIES:
        terms = set(an.tokens(text))
        matched = [d for d, ts in tok.items() if ts & terms]
        if matched:
            v = nchars.loc[matched]
            rows.append({
                "qid": qid, "n_matches": len(matched),
                "sum_chars": int(v.sum()), "min_chars": int(v.min()),
                "max_chars": int(v.max()),
                "avg_chars_micro": int(v.sum()) * 1_000_000 // len(matched),
            })
    exp = pd.DataFrame(rows).sort_values("qid").reset_index(drop=True).astype("int64")
    pd.testing.assert_frame_equal(out, exp, check_like=True)


def test_ft_bm25_postfilter_vs_oracle(ray_session):
    """Post-filtered retrieval at sf0.001 vs an independent recomputation:
    BM25Oracle scores every doc, the attribute predicate zeroes the
    non-matching docs, micro-rounded top-k with (score desc, doc_id asc)
    tie-break — engine rows must match exactly."""
    import pandas as pd

    from engine.oracle.bm25 import BM25Oracle
    from engine.pipelines import POSTFILTER_QUERIES, ft_bm25_postfilter

    sf = "/root/testdata/sf0.001"
    k = 10
    out = ft_bm25_postfilter(sf, k=k)
    docs = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    oracle = BM25Oracle(docs["doc_id"].tolist(), docs["text"].tolist())
    attrs = docs.set_index("doc_id")
    rows = []
    for qid, text, col, val in POSTFILTER_QUERIES:
        scores = oracle.score_query(text)
        ok = attrs.loc[oracle.doc_keys, col].to_numpy() == val
        scores = np.where(ok, scores, 0.0)
        nz = np.nonzero(scores)[0]
        micro = np.floor(scores[nz] * 1e6 + 0.5).astype(np.int64)
        order = np.lexsort((oracle.doc_keys[nz], -micro))[:k]
        for r, i in enumerate(order, 1):
            rows.append({"qid": qid, "rank": r,
                         "doc_id": int(oracle.doc_keys[nz][i]),
                         "score_micro": int(micro[i])})
    exp = pd.DataFrame(rows).astype("int64")
    pd.testing.assert_frame_equal(out.reset_index(drop=True), exp)


def test_ft_hybrid_rrf_vs_independent_recompute(ray_session):
    """Hybrid RRF at sf0.001 vs a from-scratch recomputation: BM25Oracle
    text ranks + raw-numpy cosine ranks, integer RRF fusion — no engine
    retrieval code on the expected side."""
    import pandas as pd

    from engine.oracle.bm25 import BM25Oracle
    from engine.pipelines import HYBRID_QUERIES, RRF_K, RRF_SCALE, ft_hybrid_rrf

    sf = "/root/testdata/sf0.001"
    k, n_each = 10, 20
    out = ft_hybrid_rrf(sf, k=k, n_each=n_each)
    docs = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    emb = pq.read_table(f"{sf}/embeddings.parquet").to_pandas().sort_values("vec_id")
    oracle = BM25Oracle(docs["doc_id"].tolist(), docs["text"].tolist())
    m = np.stack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    vids = emb["vec_id"].to_numpy()
    rows = []
    for qid, text, seed in HYBRID_QUERIES:
        contrib: dict[int, int] = {}
        tk, ts = oracle.topk(text, n_each)
        tmicro = np.floor(ts * 1e6 + 0.5).astype(np.int64)
        order = np.lexsort((tk, -tmicro))  # re-rank on micro ints like the engine
        for r, i in enumerate(order, 1):
            contrib[int(tk[i])] = contrib.get(int(tk[i]), 0) + RRF_SCALE // (RRF_K + r)
        sims = np.floor((m @ m[np.where(vids == seed)[0][0]]) * 1e6 + 0.5).astype(np.int64)
        vorder = np.lexsort((vids, -sims))[:n_each]
        for r, i in enumerate(vorder, 1):
            contrib[int(vids[i])] = contrib.get(int(vids[i]), 0) + RRF_SCALE // (RRF_K + r)
        fused = sorted(contrib.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        for r, (d, c) in enumerate(fused, 1):
            rows.append({"qid": qid, "rank": r, "doc_id": d, "rrf_micro": c})
    exp = pd.DataFrame(rows).astype("int64")
    pd.testing.assert_frame_equal(out.reset_index(drop=True), exp)


def test_ft_bm25_wildcard_expansion_semantics(ray_session):
    """Wildcard expansion at sf0.001: expected = BM25Oracle over the query
    with each trailing-* token replaced by its top-df prefix matches
    (df desc, term asc, capped), recomputed from the corpus directly."""
    import pandas as pd
    from collections import Counter

    from engine.oracle.bm25 import BM25Oracle
    from engine.pipelines import MAX_EXPAND, WILDCARD_QUERIES, ft_bm25_wildcard
    from engine.text.analyzer import Analyzer

    sf = "/root/testdata/sf0.001"
    k = 10
    out = ft_bm25_wildcard(sf, k=k)
    docs = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    oracle = BM25Oracle(docs["doc_id"].tolist(), docs["text"].tolist())
    an = Analyzer()
    df = Counter()
    for text in docs["text"]:
        df.update(set(an.tokens(text)))
    rows = []
    for qid, qtext in WILDCARD_QUERIES:
        terms = []
        for tok in qtext.split():
            if tok.endswith("*"):
                p = tok.rstrip("*")
                hits = sorted((t for t in df if t.startswith(p)),
                              key=lambda t: (-df[t], t))[:MAX_EXPAND]
                terms.extend(hits)
            else:
                terms.append(tok)
        dk, sc = oracle.topk(" ".join(terms) if terms else "", k)
        micro = np.floor(sc * 1e6 + 0.5).astype(np.int64)
        order = np.lexsort((dk, -micro))
        for r, i in enumerate(order, 1):
            rows.append({"qid": qid, "rank": r, "doc_id": int(dk[i]),
                         "score_micro": int(micro[i])})
    exp = pd.DataFrame(rows).astype("int64")
    pd.testing.assert_frame_equal(out.reset_index(drop=True), exp)
    # the dead-prefix query (zzz*) degrades to its literal terms only
    assert set(out[out["qid"] == 4]["doc_id"]) == set(exp[exp["qid"] == 4]["doc_id"])


def test_ft_bm25_regexp_expansion_semantics(ray_session):
    """Regexp expansion at sf0.001: expected = BM25Oracle over the query
    with each /pattern/ token replaced by its top-df FULL-match vocabulary
    terms (df desc, term asc, capped), recomputed from the corpus."""
    import re
    from collections import Counter

    import pandas as pd

    from engine.oracle.bm25 import BM25Oracle
    from engine.pipelines import MAX_EXPAND, REGEX_QUERIES, ft_bm25_regexp
    from engine.text.analyzer import Analyzer

    sf = "/root/testdata/sf0.001"
    k = 10
    out = ft_bm25_regexp(sf, k=k)
    docs = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    oracle = BM25Oracle(docs["doc_id"].tolist(), docs["text"].tolist())
    an = Analyzer()
    df = Counter()
    for text in docs["text"]:
        df.update(set(an.tokens(text)))
    rows = []
    for qid, qtext in REGEX_QUERIES:
        terms = []
        for tok in qtext.split():
            if len(tok) >= 2 and tok.startswith("/") and tok.endswith("/"):
                pat = re.compile(tok[1:-1])
                hits = sorted((t for t in df if pat.fullmatch(t)),
                              key=lambda t: (-df[t], t))[:MAX_EXPAND]
                terms.extend(hits)
            else:
                terms.append(tok)
        dk, sc = oracle.topk(" ".join(terms) if terms else "", k)
        micro = np.floor(sc * 1e6 + 0.5).astype(np.int64)
        order = np.lexsort((dk, -micro))
        for r, i in enumerate(order, 1):
            rows.append({"qid": qid, "rank": r, "doc_id": int(dk[i]),
                         "score_micro": int(micro[i])})
    exp = pd.DataFrame(rows).astype("int64")
    pd.testing.assert_frame_equal(out.reset_index(drop=True), exp)
    # alternation actually expanded to >1 term: qid 1 (/s(low|can)/) must
    # rank docs containing either slow or scan
    assert len(out[out["qid"] == 1]) == k


def test_tr_match_histogram_vs_pandas(ray_session):
    """Daily match histogram vs a pandas recomputation over the same
    materialized transcript corpus (match = shares ≥1 analyzer term)."""
    import pandas as pd

    from engine.oracle.bm25 import seeded_query_set
    from engine.pipelines import tr_match_histogram, tr_oracle_corpus_path
    from engine.text.analyzer import Analyzer

    out = tr_match_histogram("/root/testdata/sf0.001")
    src = pq.read_table(tr_oracle_corpus_path()).to_pandas()
    an = Analyzer()
    toks = [set(an.tokens(t)) for t in src["text"]]
    # parquet timestamp[us] survives into pandas as datetime64[us]
    day_epoch = (src["ts"].dt.floor("D").astype("datetime64[us]").astype("int64")
                 // 1_000_000).to_numpy()
    rows = []
    for qid, qtext in seeded_query_set(20, seed=7):
        terms = set(an.tokens(qtext))
        hit = np.array([bool(ts & terms) for ts in toks])
        days, counts = np.unique(day_epoch[hit], return_counts=True)
        for d, c in zip(days, counts):
            rows.append({"qid": qid, "day_epoch": int(d), "n_matches": int(c)})
    exp = (pd.DataFrame(rows).sort_values(["qid", "day_epoch"])
           .reset_index(drop=True).astype("int64"))
    pd.testing.assert_frame_equal(out, exp)


def test_tr_bm25_boosted_vs_oracle(ray_session):
    """Role-boosted ranking vs BM25Oracle × boost recompute over the
    materialized transcript corpus."""
    import pandas as pd

    from engine.oracle.bm25 import BM25Oracle, seeded_query_set
    from engine.pipelines import ROLE_BOOSTS, tr_bm25_boosted, tr_oracle_corpus_path

    k = 10
    out = tr_bm25_boosted("/root/testdata/sf0.001", k=k)
    src = pq.read_table(tr_oracle_corpus_path()).to_pandas()
    oracle = BM25Oracle(src["doc_key"].tolist(), src["text"].tolist())
    boost = (src.set_index("doc_key")["role"].map(ROLE_BOOSTS).fillna(1.0)
             .loc[oracle.doc_keys].to_numpy())
    rows = []
    for qid, qtext in seeded_query_set(20, seed=7):
        s = oracle.score_query(qtext)
        micro = np.floor(boost * s * 1e6 + 0.5).astype(np.int64)
        nz = np.nonzero(s)[0]
        order = nz[np.lexsort((oracle.doc_keys[nz], -micro[nz]))][:k]
        for r, i in enumerate(order, 1):
            rows.append({"qid": qid, "rank": r, "doc_key": int(oracle.doc_keys[i]),
                         "score_micro": int(micro[i])})
    exp = pd.DataFrame(rows).astype("int64")
    pd.testing.assert_frame_equal(out.reset_index(drop=True), exp)
    # the boost actually reorders: some query must rank a user turn above a
    # higher-raw-score assistant turn (sanity that the op isn't a no-op)
    raw = pd.concat([
        pd.DataFrame({"qid": qid, "doc_key": oracle.topk(t, k)[0]})
        for qid, t in seeded_query_set(20, seed=7)
    ])
    assert not raw.reset_index(drop=True).equals(
        out[["qid", "doc_key"]].reset_index(drop=True))


def test_ft_significant_terms_vs_python(ray_session):
    """Significant-terms at sf0.001 vs a full Python recompute: OR match
    sets, per-term foreground df, integer lift score, (score desc, term asc)
    top-n — and the no-such-term query yields no rows."""
    import pandas as pd

    from engine.pipelines import (DOC_QUERIES, SIGTERMS_SCALE,
                                  ft_significant_terms)
    from engine.text.analyzer import Analyzer

    sf = "/root/testdata/sf0.001"
    top_n = 5
    out = ft_significant_terms(sf, top_n=top_n)
    docs = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    an = Analyzer()
    tok = {int(r.doc_id): set(an.tokens(r.text)) for r in docs.itertuples()}
    n_docs = len(docs)
    bg = {}
    for ts in tok.values():
        for t in ts:
            bg[t] = bg.get(t, 0) + 1
    rows = []
    for qid, qtext in DOC_QUERIES:
        qterms = set(an.tokens(qtext))
        matched = [d for d, ts in tok.items() if ts & qterms]
        if not matched:
            continue
        fg = {}
        for d in matched:
            for t in tok[d]:
                fg[t] = fg.get(t, 0) + 1
        scored = sorted(
            ((f * n_docs * SIGTERMS_SCALE // (bg[t] * len(matched)), t, f)
             for t, f in fg.items()),
            key=lambda x: (-x[0], x[1]))[:top_n]
        for r, (s, t, f) in enumerate(scored, 1):
            rows.append({"qid": qid, "rank": r, "term": t, "fg_df": f,
                         "bg_df": bg[t], "score_micro": s})
    exp = pd.DataFrame(rows).astype(
        {"qid": "int64", "rank": "int64", "fg_df": "int64", "bg_df": "int64",
         "score_micro": "int64"})
    pd.testing.assert_frame_equal(out.reset_index(drop=True), exp)
    assert 7 not in set(out["qid"])  # zzz nosuchterm: empty match set


def test_tr_bm25_collapse_vs_oracle(ray_session):
    """Field collapsing vs a pandas recompute over BM25Oracle scores: one
    hit per conversation (the best turn, score desc / doc_key asc), convs
    ranked by their representative's score — and collapsing actually
    removed same-conv runner-ups some query had in its flat top-k."""
    import pandas as pd

    from engine.oracle.bm25 import BM25Oracle, seeded_query_set
    from engine.pipelines import tr_bm25_collapse, tr_oracle_corpus_path

    k = 10
    out = tr_bm25_collapse("/root/testdata/sf0.001", k=k)
    src = pq.read_table(tr_oracle_corpus_path()).to_pandas()
    oracle = BM25Oracle(src["doc_key"].tolist(), src["text"].tolist())
    conv_of = src.set_index("doc_key")["conv_id"]
    rows = []
    for qid, qtext in seeded_query_set(20, seed=7):
        s = oracle.score_query(qtext)
        micro = np.floor(s * 1e6 + 0.5).astype(np.int64)
        nz = np.nonzero(s)[0]
        df = pd.DataFrame({
            "doc_key": oracle.doc_keys[nz],
            "score_micro": micro[nz],
            "conv_id": conv_of.loc[oracle.doc_keys[nz]].to_numpy(),
        }).sort_values(["score_micro", "doc_key"], ascending=[False, True],
                       kind="stable")
        best = df.groupby("conv_id", sort=False).head(1).head(k)
        for r, t in enumerate(best.itertuples(), 1):
            rows.append({"qid": qid, "rank": r, "conv_id": t.conv_id,
                         "doc_key": int(t.doc_key),
                         "score_micro": int(t.score_micro)})
    exp = pd.DataFrame(rows)
    exp = exp.astype({"qid": "int64", "rank": "int64", "doc_key": "int64",
                      "score_micro": "int64"})
    pd.testing.assert_frame_equal(out.reset_index(drop=True), exp)
    # one hit per conv, and the collapse is not a no-op
    assert (out.groupby(["qid", "conv_id"]).size() == 1).all()
    flat = pd.concat([
        pd.DataFrame({"qid": qid, "doc_key": oracle.topk(t, k)[0]})
        for qid, t in seeded_query_set(20, seed=7)
    ]).merge(src[["doc_key", "conv_id"]], on="doc_key")
    assert (flat.groupby(["qid", "conv_id"]).size() > 1).any()


def test_tr_bm25_recency_vs_oracle(ray_session):
    """Recency decay vs BM25Oracle × integer ppm weight recompute, and the
    decay actually reorders at least one query's ranking."""
    import pandas as pd

    from engine.oracle.bm25 import BM25Oracle, seeded_query_set
    from engine.pipelines import (RECENCY_DECAY_PPM_PER_HOUR,
                                  RECENCY_FLOOR_PPM, tr_bm25_recency,
                                  tr_oracle_corpus_path)

    k = 10
    out = tr_bm25_recency("/root/testdata/sf0.001", k=k)
    src = pq.read_table(tr_oracle_corpus_path()).to_pandas()
    oracle = BM25Oracle(src["doc_key"].tolist(), src["text"].tolist())
    ts_us = src.set_index("doc_key")["ts"].astype("int64")
    ts_max = int(ts_us.max())
    age_h = (ts_max - ts_us.loc[oracle.doc_keys].to_numpy()) // 3_600_000_000
    w = np.maximum(1_000_000 - age_h * RECENCY_DECAY_PPM_PER_HOUR,
                   RECENCY_FLOOR_PPM)
    assert w.min() == RECENCY_FLOOR_PPM and w.max() > RECENCY_FLOOR_PPM
    rows = []
    for qid, qtext in seeded_query_set(20, seed=7):
        s = oracle.score_query(qtext)
        raw = np.floor(s * 1e6 + 0.5).astype(np.int64)
        micro = raw * w // 1_000_000
        nz = np.nonzero(s)[0]
        order = nz[np.lexsort((oracle.doc_keys[nz], -micro[nz]))][:k]
        for r, i in enumerate(order, 1):
            rows.append({"qid": qid, "rank": r, "doc_key": int(oracle.doc_keys[i]),
                         "score_micro": int(micro[i])})
    exp = pd.DataFrame(rows).astype("int64")
    pd.testing.assert_frame_equal(out.reset_index(drop=True), exp)
    flat = pd.concat([
        pd.DataFrame({"qid": qid, "doc_key": oracle.topk(t, k)[0]})
        for qid, t in seeded_query_set(20, seed=7)
    ]).reset_index(drop=True)
    assert not flat.equals(out[["qid", "doc_key"]].reset_index(drop=True))


def test_ft_bm25_search_after_equals_top2k(ray_session):
    """Cursor-walk identity: page1 ∪ page2 (search_after) must equal the
    single-shot top-2k, rank for rank."""
    import pandas as pd

    from engine.pipelines import ft_bm25_search_after, ft_bm25_topk

    sf = "/root/testdata/sf0.001"
    k = 10
    page1 = ft_bm25_topk(sf, k=k)
    page2 = ft_bm25_search_after(sf, k=k)
    walked = (pd.concat([page1, page2], ignore_index=True)
              .sort_values(["qid", "rank"]).reset_index(drop=True))
    top2k = ft_bm25_topk(sf, k=2 * k)
    # queries with short page 1 never get a page 2; compare the qids the
    # walk covers fully plus assert short queries gained nothing
    full_q = set(page1.groupby("qid").size()[lambda s: s == k].index)
    assert set(page2["qid"]) <= full_q
    lhs = walked[walked["qid"].isin(full_q)].reset_index(drop=True)
    rhs = top2k[top2k["qid"].isin(full_q)].reset_index(drop=True)
    pd.testing.assert_frame_equal(lhs, rhs)


def test_ft_bm25_synonyms_expansion(ray_session):
    """Synonym expansion equals BM25Oracle over the manually expanded term
    set; a query whose term belongs to a class must surface docs containing
    ONLY a sibling synonym."""
    import pandas as pd

    from engine.oracle.bm25 import BM25Oracle
    from engine.pipelines import SYN_QUERIES, SYNONYM_GROUPS, ft_bm25_synonyms

    sf = "/root/testdata/sf0.001"
    k = 10
    out = ft_bm25_synonyms(sf, k=k)
    docs = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    oracle = BM25Oracle(docs["doc_id"].tolist(), docs["text"].tolist())
    syn = {t: grp for grp in SYNONYM_GROUPS for t in grp}
    rows = []
    for qid, text in SYN_QUERIES:
        terms = []
        for tok in text.split():
            terms.extend(syn.get(tok, (tok,)))
        dk, sc = oracle.topk(" ".join(terms), k)
        micro = np.floor(sc * 1e6 + 0.5).astype(np.int64)
        order = np.lexsort((dk, -micro))
        for r, i in enumerate(order, 1):
            rows.append({"qid": qid, "rank": r, "doc_id": int(dk[i]),
                         "score_micro": int(micro[i])})
    exp = pd.DataFrame(rows).astype("int64")
    pd.testing.assert_frame_equal(out.reset_index(drop=True), exp)
    # expansion is live: the expanded ranking must differ from the
    # unexpanded one for at least one query
    unexpanded = pd.concat([
        pd.DataFrame({"qid": qid, "doc_id": oracle.topk(text, k)[0]})
        for qid, text in SYN_QUERIES
    ]).reset_index(drop=True)
    assert not unexpanded.equals(out[["qid", "doc_id"]].reset_index(drop=True))


def test_tr_conv_stats_vs_pandas(ray_session):
    """Conversation rollup vs one pandas groupby over the same parquet."""
    import pandas as pd

    from engine.pipelines import tr_conv_stats, tr_oracle_corpus_path

    out = tr_conv_stats("/root/testdata/sf0.001")
    src = pq.read_table(tr_oracle_corpus_path()).to_pandas()
    us = src["ts"].astype("datetime64[us]").astype("int64")
    df = pd.DataFrame({"conv_id": src["conv_id"],
                       "is_tool": (src["role"] == "tool").astype("int64"),
                       "us": us,
                       "chars": src["text"].str.len().astype("int64")})
    exp = df.groupby("conv_id", as_index=False).agg(
        n_turns=("us", "size"), n_tool=("is_tool", "sum"),
        first_us=("us", "min"), last_us=("us", "max"),
        sum_chars=("chars", "sum"))
    exp["duration_us"] = exp["last_us"] - exp["first_us"]
    exp = exp[["conv_id", "n_turns", "n_tool", "first_us", "last_us",
               "duration_us", "sum_chars"]].sort_values("conv_id").reset_index(drop=True)
    exp = exp.astype({c: "int64" for c in exp.columns if c != "conv_id"})
    pd.testing.assert_frame_equal(out, exp)


def test_ft_match_percentiles_vs_pandas(ray_session):
    """Percentiles agg over match sets at sf0.001 vs a pandas/np
    recomputation of the inverted-CDF definition (smallest value whose
    cumulative count reaches ceil(pct/100 * N))."""
    import pandas as pd

    from engine.pipelines import DOC_QUERIES, MATCH_PCTS, ft_match_percentiles
    from engine.text.analyzer import Analyzer

    sf = "/root/testdata/sf0.001"
    out = ft_match_percentiles(sf)
    docs = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    an = Analyzer()
    tok = {int(r.doc_id): set(an.tokens(r.text)) for r in docs.itertuples()}
    nchars = docs.set_index("doc_id")["n_chars"]
    rows = []
    for qid, text in DOC_QUERIES:
        terms = set(an.tokens(text))
        matched = [d for d, ts in tok.items() if ts & terms]
        if not matched:
            continue
        v = np.sort(nchars.loc[matched].to_numpy().astype(np.int64))
        for p in MATCH_PCTS:
            need = -(-p * v.size // 100)  # ceil
            val = int(v[need - 1])
            rows.append({"qid": qid, "pct": p, "n_chars": val,
                         "n_le": int(np.searchsorted(v, val, side="right"))})
    exp = (
        pd.DataFrame(rows).astype("int64")
        .sort_values(["qid", "pct"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp)


def test_ft_cardinality_vs_pandas(ray_session):
    """Exact cardinality agg over match sets at sf0.001 vs a pandas
    distinct-count recomputation."""
    import pandas as pd

    from engine.pipelines import DOC_QUERIES, ft_cardinality
    from engine.text.analyzer import Analyzer

    sf = "/root/testdata/sf0.001"
    out = ft_cardinality(sf)
    docs = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    an = Analyzer()
    tok = {int(r.doc_id): set(an.tokens(r.text)) for r in docs.itertuples()}
    attrs = docs.set_index("doc_id")
    rows = []
    for qid, text in DOC_QUERIES:
        terms = set(an.tokens(text))
        matched = [d for d, ts in tok.items() if ts & terms]
        if not matched:
            continue
        for f in ("lang", "source"):
            rows.append({"qid": qid, "facet": f,
                         "n_distinct": attrs.loc[matched, f].nunique()})
    exp = (
        pd.DataFrame(rows).sort_values(["qid", "facet"]).reset_index(drop=True)
        .astype({"qid": "int64", "n_distinct": "int64"})
    )
    pd.testing.assert_frame_equal(
        out.sort_values(["qid", "facet"]).reset_index(drop=True), exp,
        check_like=True,
    )


def test_ft_adjacency_vs_pandas(ray_session):
    """Adjacency-matrix agg at sf0.001 vs set-intersection recomputation:
    every pair count equals |match(a) & match(b)| and the diagonal is each
    query's own match count."""
    from engine.pipelines import DOC_QUERIES, ft_adjacency
    from engine.text.analyzer import Analyzer

    sf = "/root/testdata/sf0.001"
    out = ft_adjacency(sf)
    docs = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    an = Analyzer()
    tok = {int(r.doc_id): set(an.tokens(r.text)) for r in docs.itertuples()}
    msets = {}
    for qid, text in DOC_QUERIES:
        terms = set(an.tokens(text))
        msets[qid] = {d for d, ts in tok.items() if ts & terms}
    got = {(int(r.qid_a), int(r.qid_b)): int(r.n_both) for r in out.itertuples()}
    qids = sorted(msets)
    exp = {}
    for i in qids:
        for j in qids:
            if i <= j and msets[i] & msets[j]:
                exp[(i, j)] = len(msets[i] & msets[j])
    assert got == exp
    for qid in qids:
        if msets[qid]:
            assert got[(qid, qid)] == len(msets[qid])


def test_tr_has_child_vs_oracle(ray_session):
    """Parent-child sum-mode: conversations ranked by the SUM of matching
    turns' micro scores (plus inner-hit counts) vs a pandas recompute over
    BM25Oracle — and sum-mode genuinely reorders vs max-mode somewhere."""
    import pandas as pd

    from engine.oracle.bm25 import BM25Oracle, seeded_query_set
    from engine.pipelines import tr_has_child, tr_oracle_corpus_path

    k = 10
    out = tr_has_child("/root/testdata/sf0.001", k=k)
    src = pq.read_table(tr_oracle_corpus_path()).to_pandas()
    oracle = BM25Oracle(src["doc_key"].tolist(), src["text"].tolist())
    conv_of = src.set_index("doc_key")["conv_id"]
    rows = []
    reordered = False
    for qid, qtext in seeded_query_set(20, seed=7):
        s = oracle.score_query(qtext)
        micro = np.floor(s * 1e6 + 0.5).astype(np.int64)
        nz = np.nonzero(s)[0]
        df = pd.DataFrame({
            "score_micro": micro[nz],
            "conv_id": conv_of.loc[oracle.doc_keys[nz]].to_numpy(),
        })
        agg = (df.groupby("conv_id")
                 .agg(sum_micro=("score_micro", "sum"),
                      n_hits=("score_micro", "size"),
                      max_micro=("score_micro", "max"))
                 .reset_index()
                 .sort_values(["sum_micro", "conv_id"], ascending=[False, True],
                              kind="stable"))
        top = agg.head(k)
        by_max = agg.sort_values(["max_micro", "conv_id"],
                                 ascending=[False, True], kind="stable").head(k)
        reordered |= top["conv_id"].tolist() != by_max["conv_id"].tolist()
        for r, t in enumerate(top.itertuples(), 1):
            rows.append({"qid": qid, "rank": r, "conv_id": t.conv_id,
                         "sum_micro": int(t.sum_micro), "n_hits": int(t.n_hits)})
    exp = pd.DataFrame(rows).astype(
        {"qid": "int64", "rank": "int64", "sum_micro": "int64", "n_hits": "int64"})
    pd.testing.assert_frame_equal(out.reset_index(drop=True), exp)
    assert reordered, "sum-mode should differ from max-mode on this corpus"


def test_ft_top_hits_vs_duckdb(ray_session):
    """top_hits buckets: best n per (query, source), boundary ties broken
    by doc_id — verified against the SQL oracle at sf0.001, plus shape
    invariants (≤ n per bucket, ranks contiguous from 1)."""
    import duckdb
    import pandas as pd

    from __ray_entry__ import _top_hits_sql
    from engine.pipelines import ft_top_hits

    sf = "/root/testdata/sf0.001"
    got = ft_top_hits(sf, n=3)
    assert len(got) > 0
    assert (got.groupby(["qid", "source"]).size() <= 3).all()
    assert (got.groupby(["qid", "source"])["rank"].min() == 1).all()
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from read_parquet('{sf}/documents.parquet')"
    )
    ref = con.execute(_top_hits_sql(3)).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        ref[got.columns].astype(got.dtypes.to_dict()).reset_index(drop=True),
    )


def test_ft_composite_buckets_pagination(ray_session):
    """Composite page: exclusive after-key honoured, page size capped,
    values match the SQL oracle."""
    import duckdb
    import pandas as pd

    from __ray_entry__ import _composite_buckets_sql
    from engine.pipelines import COMPOSITE_AFTER, COMPOSITE_PAGE, ft_composite_buckets

    sf = "/root/testdata/sf0.001"
    got = ft_composite_buckets(sf)
    assert 0 < len(got) <= COMPOSITE_PAGE
    s, l = COMPOSITE_AFTER
    assert ((got["source"] > s) | ((got["source"] == s) & (got["lang"] > l))).all()
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from read_parquet('{sf}/documents.parquet')"
    )
    ref = con.execute(_composite_buckets_sql()).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        ref[got.columns].astype(got.dtypes.to_dict()).reset_index(drop=True),
    )


def test_ft_match_len_histogram_vs_duckdb(ray_session):
    """Histogram buckets sum to the match-set size per query; parity with
    the SQL oracle."""
    import duckdb
    import pandas as pd

    from __ray_entry__ import _match_len_histogram_sql
    from engine.pipelines import HIST_INTERVAL, ft_match_len_histogram

    sf = "/root/testdata/sf0.001"
    got = ft_match_len_histogram(sf)
    assert len(got) > 0
    assert (got["bucket"] % HIST_INTERVAL == 0).all()
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from read_parquet('{sf}/documents.parquet')"
    )
    ref = con.execute(_match_len_histogram_sql()).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        ref[got.columns].astype(got.dtypes.to_dict()).reset_index(drop=True),
    )


def test_tr_dis_max_vs_oracle(ray_session):
    """Multi-field best_fields: per-doc max of text-field and tool-field
    BM25 micro scores, each field scored with its own stats — vs two
    BM25Oracle recomputes; and the tool field genuinely wins somewhere."""
    import pandas as pd

    from engine.oracle.bm25 import BM25Oracle
    from engine.pipelines import _dismax_query_set, tr_dis_max, tr_oracle_corpus_path

    k = 10
    out = tr_dis_max("/root/testdata/sf0.001", k=k)
    src = pq.read_table(tr_oracle_corpus_path()).to_pandas()
    o_text = BM25Oracle(src["doc_key"].tolist(), src["text"].tolist())
    o_tool = BM25Oracle(src["doc_key"].tolist(), src["tool"].tolist())
    rows = []
    tool_wins = False
    for qid, qtext in _dismax_query_set():
        parts = []
        for o in (o_text, o_tool):
            s = o.score_query(qtext)
            nz = np.nonzero(s)[0]
            parts.append(pd.DataFrame({
                "doc_key": o.doc_keys[nz],
                "m": np.floor(s[nz] * 1e6 + 0.5).astype(np.int64),
            }))
        st, sk = parts
        best = (pd.concat(parts).groupby("doc_key", as_index=False)["m"].max()
                  .sort_values(["m", "doc_key"], ascending=[False, True],
                               kind="stable").head(k))
        tmap = st.set_index("doc_key")["m"]
        for r, t in enumerate(best.itertuples(), 1):
            rows.append({"qid": qid, "rank": r, "doc_key": int(t.doc_key),
                         "score_micro": int(t.m)})
            tool_wins |= int(t.m) > int(tmap.get(t.doc_key, 0))
    exp = pd.DataFrame(rows).astype({c: "int64" for c in
                                     ["qid", "rank", "doc_key", "score_micro"]})
    pd.testing.assert_frame_equal(out.reset_index(drop=True), exp)
    assert tool_wins, "some top-k hit must be carried by the tool field"


def test_ft_terms_sub_aggs_vs_duckdb(ray_session):
    """Bucket metrics (min/max/sum/exact integer avg) per (query, source)
    match DuckDB, and the integer-pair avg is consistent."""
    import duckdb
    import pandas as pd

    from __ray_entry__ import _terms_sub_aggs_sql
    from engine.pipelines import ft_terms_sub_aggs

    sf = "/root/testdata/sf0.001"
    got = ft_terms_sub_aggs(sf)
    assert len(got) > 0
    assert (got["avg_chars_micro"]
            == got["sum_chars"] * 1_000_000 // got["n_matches"]).all()
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from read_parquet('{sf}/documents.parquet')"
    )
    ref = con.execute(_terms_sub_aggs_sql()).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        ref[got.columns].astype(got.dtypes.to_dict()).reset_index(drop=True),
    )


def test_ft_rare_terms_vs_duckdb(ray_session):
    """rare_terms keeps only buckets at or under the df ceiling and the
    threshold actually prunes something."""
    import duckdb
    import pandas as pd

    from __ray_entry__ import _rare_terms_sql
    from engine.pipelines import RARE_MAX_DF, ft_rare_terms, ft_terms_sub_aggs

    sf = "/root/testdata/sf0.001"
    got = ft_rare_terms(sf)
    assert len(got) > 0
    assert (got["n_matches"] <= RARE_MAX_DF).all()
    _ = ft_terms_sub_aggs  # bucket-family sibling
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from read_parquet('{sf}/documents.parquet')"
    )
    ref = con.execute(_rare_terms_sql()).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        ref[got.columns].astype(got.dtypes.to_dict()).reset_index(drop=True),
    )
    # the ceiling genuinely prunes: the un-thresholded bucket table is bigger
    no_having = _rare_terms_sql().replace(
        f"HAVING count(*) <= {RARE_MAX_DF}", "")
    n_all = len(con.execute(no_having).fetchdf())
    assert len(got) < n_all


def test_tr_sort_by_field_vs_oracle(ray_session):
    """Field-sorted retrieval: newest-first within each query, and every
    hit is a genuine match — vs a pandas recompute."""
    import pandas as pd

    from engine.oracle.bm25 import BM25Oracle, seeded_query_set
    from engine.pipelines import tr_oracle_corpus_path, tr_sort_by_field

    k = 10
    out = tr_sort_by_field("/root/testdata/sf0.001", k=k)
    src = pq.read_table(tr_oracle_corpus_path()).to_pandas()
    oracle = BM25Oracle(src["doc_key"].tolist(), src["text"].tolist())
    ts_us = src.set_index("doc_key")["ts"].astype("int64")
    if ts_us.iloc[0] > 10**16:  # ns-resolution frame
        ts_us = ts_us // 1000
    rows = []
    for qid, qtext in seeded_query_set(20, seed=7):
        s = oracle.score_query(qtext)
        nz = oracle.doc_keys[np.nonzero(s)[0]]
        df = pd.DataFrame({"doc_key": nz, "ts_us": ts_us.loc[nz].to_numpy()})
        df = df.sort_values(["ts_us", "doc_key"], ascending=[False, True],
                            kind="stable").head(k)
        for r, t in enumerate(df.itertuples(), 1):
            rows.append({"qid": qid, "rank": r, "doc_key": int(t.doc_key),
                         "ts_us": int(t.ts_us)})
    exp = pd.DataFrame(rows).astype({c: "int64" for c in
                                     ["qid", "rank", "doc_key", "ts_us"]})
    pd.testing.assert_frame_equal(out.reset_index(drop=True), exp)
    for _qid, g in out.groupby("qid"):
        assert (g["ts_us"].diff().dropna() <= 0).all()


def test_ft_term_vectors_vs_analyzer(ray_session):
    """Term vectors served from the index equal a fresh analyzer recompute
    (tf) and the corpus df for every term of every requested doc."""
    import pandas as pd

    from engine.pipelines import TV_DOC_IDS, ft_term_vectors
    from engine.text.analyzer import Analyzer

    sf = "/root/testdata/sf0.001"
    out = ft_term_vectors(sf)
    docs = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    an = Analyzer()
    tok = {int(r.doc_id): an.tokens(r.text) for r in docs.itertuples()}
    dfc: dict[str, int] = {}
    for ts in tok.values():
        for t in set(ts):
            dfc[t] = dfc.get(t, 0) + 1
    rows = []
    for d in TV_DOC_IDS:
        cnt: dict[str, int] = {}
        for t in tok[d]:
            cnt[t] = cnt.get(t, 0) + 1
        for t in sorted(cnt):
            rows.append({"doc_id": d, "term": t, "tf": cnt[t], "df": dfc[t]})
    exp = pd.DataFrame(rows).astype({"doc_id": "int64", "tf": "int64", "df": "int64"})
    pd.testing.assert_frame_equal(out.reset_index(drop=True), exp)


def test_ft_diversified_sampler_vs_duckdb(ray_session):
    """Sampler: ≤ m docs per (query, source), deterministic keep-lowest
    doc_key order, and the cap genuinely drops docs somewhere."""
    import duckdb
    import pandas as pd

    from __ray_entry__ import _diversified_sampler_sql
    from engine.pipelines import SAMPLER_SHARD, ft_diversified_sampler

    sf = "/root/testdata/sf0.001"
    got = ft_diversified_sampler(sf)
    assert len(got) > 0
    sizes = got.groupby(["qid", "source"]).size()
    assert (sizes <= SAMPLER_SHARD).all()
    assert (sizes == SAMPLER_SHARD).any(), "cap must bind somewhere"
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from read_parquet('{sf}/documents.parquet')"
    )
    ref = con.execute(_diversified_sampler_sql()).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        ref[got.columns].astype(got.dtypes.to_dict()).reset_index(drop=True),
    )


def test_ft_extended_stats_vs_duckdb(ray_session):
    """Integer-exact moments: DuckDB parity plus the variance-numerator
    identity n·Σx² − (Σx)² ≥ 0 with equality iff all values equal."""
    import duckdb
    import pandas as pd

    from __ray_entry__ import _extended_stats_sql
    from engine.pipelines import ft_extended_stats

    sf = "/root/testdata/sf0.001"
    got = ft_extended_stats(sf)
    assert len(got) > 0
    assert (got["var_num"] >= 0).all()
    const = got["min_chars"] == got["max_chars"]
    assert (got.loc[const, "var_num"] == 0).all()
    assert (got.loc[~const, "var_num"] > 0).all()
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from read_parquet('{sf}/documents.parquet')"
    )
    ref = con.execute(_extended_stats_sql()).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        ref[got.columns].astype(got.dtypes.to_dict()).reset_index(drop=True),
    )


def test_ev_max_bucket_vs_pandas(ray_session):
    """max_bucket picks each type's busiest day (earliest wins ties)."""
    import pandas as pd

    from engine.pipelines import ev_max_bucket

    sf = "/root/testdata/sf0.001"
    got = ev_max_bucket(sf)
    ev = pq.read_table(f"{sf}/events.parquet", columns=["ts", "event_type"]).to_pandas()
    ev["day_epoch"] = (
        (ev["ts"].dt.floor("D") - pd.Timestamp(0)).dt.total_seconds().astype("int64")
    )
    daily = (ev.groupby(["event_type", "day_epoch"], as_index=False).size()
               .rename(columns={"size": "n_events"})
               .sort_values(["event_type", "n_events", "day_epoch"],
                            ascending=[True, False, True], kind="stable"))
    exp = (daily.groupby("event_type", sort=True).head(1)
                .reset_index(drop=True)
                .astype({"day_epoch": "int64", "n_events": "int64"}))
    pd.testing.assert_frame_equal(got, exp[got.columns.tolist()])


def test_tr_has_parent_gate(ray_session):
    """Every hit's conversation satisfies the parent predicate; the gate
    genuinely splits the corpus (both sides non-empty); survivors keep
    their relative BM25 order vs the ungated ranking."""
    import pandas as pd

    from engine.pipelines import (HAS_PARENT_MIN_TURNS, tr_bm25_oracle,
                                  tr_has_parent, tr_oracle_corpus_path)

    out = tr_has_parent("/root/testdata/sf0.001", k=10)
    assert len(out) > 0
    src = pq.read_table(tr_oracle_corpus_path()).to_pandas()
    sizes = src.groupby("conv_id").size()
    assert (sizes >= HAS_PARENT_MIN_TURNS).any()
    assert (sizes < HAS_PARENT_MIN_TURNS).any(), "gate must split the corpus"
    conv_of = src.set_index("doc_key")["conv_id"]
    assert (sizes.loc[conv_of.loc[out["doc_key"]].to_numpy()].to_numpy()
            >= HAS_PARENT_MIN_TURNS).all()
    # relative order preserved vs the ungated ranking (same scores)
    full = tr_bm25_oracle("/root/testdata/sf0.001", k=1000)
    for qid, g in out.groupby("qid"):
        fq = full[full["qid"] == qid].set_index("doc_key")["rank"]
        ranks = fq.loc[g.sort_values("rank")["doc_key"]].to_numpy()
        assert (np.diff(ranks) > 0).all()


def test_tr_boosting_demotes_not_excludes(ray_session):
    """Demoted docs stay in the result set (when k allows) with exactly
    halved micro scores, and the demotion reorders at least one query."""
    import pandas as pd

    from engine.oracle.bm25 import BM25Oracle
    from engine.pipelines import (_boosting_query_set, tr_boosting_query,
                                  tr_oracle_corpus_path)

    k = 10
    out = tr_boosting_query("/root/testdata/sf0.001", k=k)
    assert len(out) > 0
    src = pq.read_table(tr_oracle_corpus_path()).to_pandas()
    oracle = BM25Oracle(src["doc_key"].tolist(), src["text"].tolist())
    reordered = False
    for qid, text, neg in _boosting_query_set():
        s = oracle.score_query(text)
        micro = np.floor(s * 1e6 + 0.5).astype(np.int64)
        nz = np.nonzero(s)[0]
        negset = set(oracle.doc_keys[np.nonzero(oracle.score_query(neg))[0]])
        rows = pd.DataFrame({"doc_key": oracle.doc_keys[nz], "m": micro[nz]})
        hit = rows["doc_key"].isin(negset).to_numpy()
        rows["m"] = np.where(hit, rows["m"].to_numpy() // 2, rows["m"].to_numpy())
        rows = rows.sort_values(["m", "doc_key"], ascending=[False, True],
                                kind="stable").head(k)
        g = out[out["qid"] == qid]
        assert g["doc_key"].tolist() == rows["doc_key"].tolist()
        assert g["score_micro"].tolist() == rows["m"].tolist()
        plain = pd.DataFrame({"doc_key": oracle.doc_keys[nz], "m": micro[nz]})
        plain = plain.sort_values(["m", "doc_key"], ascending=[False, True],
                                  kind="stable").head(k)
        reordered |= plain["doc_key"].tolist() != rows["doc_key"].tolist()
        # demoted docs are demoted, not dropped: any demoted doc in top-k
        # appears with its halved score (checked above via exact equality)
    assert reordered, "the negative clause must reorder some query"


def test_tr_sort_by_field_docvalues(ray_session, tmp_path):
    """The docvalues variant is frame-identical to the join variant; the
    artifact is genuinely USED (poisoning one part's vals changes what a
    lookup returns) and a corpus-identity change invalidates it."""
    import json
    import os

    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from engine.pipelines import (tr_oracle_index, tr_sort_by_field,
                                  tr_sort_by_field_dv)
    from engine.query.docvalues import DocValuesLookup, ensure_docvalues

    sf = "/root/testdata/sf0.001"
    dv_out = tr_sort_by_field_dv(sf, k=10)
    join_out = tr_sort_by_field(sf, k=10)
    pd.testing.assert_frame_equal(dv_out, join_out)

    path, idx = tr_oracle_index()
    dv = ensure_docvalues(idx, path, field="ts")
    probe = int(dv_out["doc_key"].iloc[0])
    part = probe % json.load(open(os.path.join(dv, "_DV.json")))["parts"]
    vals_path = os.path.join(dv, f"part={part}", "vals.npy")
    orig = np.load(vals_path)
    keys = np.load(os.path.join(dv, f"part={part}", "keys.npy"))
    poisoned = orig.copy()
    poisoned[np.searchsorted(keys, probe)] = -12345
    np.save(vals_path, poisoned)
    try:
        got = DocValuesLookup(dv, out_col="v")(
            pa.table({"doc_key": pa.array([probe], pa.int64())})
        )
        assert got["v"][0].as_py() == -12345, "artifact must be the source"
    finally:
        np.save(vals_path, orig)
    # fingerprint invalidation: a corpus identity change forces a rebuild
    os.utime(path)  # mtime_ns changes -> fingerprint changes
    dv2 = ensure_docvalues(idx, path, field="ts")
    assert dv2 == dv
    fresh = DocValuesLookup(dv2, out_col="v")(
        pa.table({"doc_key": pa.array([probe], pa.int64())})
    )
    assert fresh["v"][0].as_py() == int(orig[np.searchsorted(keys, probe)])

    # unknown keys refuse loudly (the hydrate invariant)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="missing"):
        DocValuesLookup(dv2, out_col="v")(
            pa.table({"doc_key": pa.array([np.int64(3)], pa.int64())})
        )


def test_ft_matrix_stats_vs_pandas(ray_session):
    """matrix_stats moments recomputed with pandas over brute-force match
    sets; Cauchy–Schwarz (cov_num² ≤ var_x·var_y) and nonnegative variance
    numerators hold for every query row."""
    from engine.pipelines import DOC_QUERIES, ft_matrix_stats
    from engine.text.analyzer import Analyzer

    sf = "/root/testdata/sf0.001"
    got = ft_matrix_stats(sf)
    an = Analyzer()
    docs = pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id", "text", "n_chars"]
    ).to_pandas()
    toks = [an.tokens(t) for t in docs["text"]]
    docs["x"] = [len(t) for t in toks]
    tok_sets = [set(t) for t in toks]

    for r in got.itertuples():
        qterms = set(an.tokens(dict(DOC_QUERIES)[int(r.qid)]))
        m = docs[[bool(qterms & s) for s in tok_sets]]
        x = m["x"].astype("int64")
        y = m["n_chars"].astype("int64")
        n = len(m)
        assert n == r.n_matches and n > 0
        assert (int(x.sum()), int(y.sum())) == (r.sum_x, r.sum_y)
        assert (int((x * x).sum()), int((y * y).sum()), int((x * y).sum())) == \
            (r.sum_xx, r.sum_yy, r.sum_xy)
        assert r.cov_num == n * r.sum_xy - r.sum_x * r.sum_y
        assert r.var_x_num >= 0 and r.var_y_num >= 0
        assert r.cov_num * r.cov_num <= r.var_x_num * r.var_y_num
    # the no-match query contributes no row
    assert 7 not in set(got["qid"])


def test_tr_exists_filter_context_semantics(ray_session):
    """exists-query gate: every hit carries a tool value; each hit's score
    equals the UNfiltered ranking's score for the same (qid, doc_key) —
    filter context must not touch stats — and the filter provably bites
    (some unfiltered top-k doc is toolless and absent here)."""
    from engine.pipelines import tr_bm25_oracle, tr_exists, tr_oracle_corpus_path

    got = tr_exists("unused", k=10)
    base = tr_bm25_oracle("unused", k=10)
    corpus = pq.read_table(tr_oracle_corpus_path(),
                           columns=["doc_key", "tool"]).to_pandas()
    tool = corpus.set_index("doc_key")["tool"].astype(str)

    assert len(got) and (tool.loc[got["doc_key"]] != "").all()
    merged = got.merge(base, on=["qid", "doc_key"], suffixes=("_e", "_b"))
    assert len(merged) and (merged["score_micro_e"] == merged["score_micro_b"]).all()
    dropped = base.merge(got, on=["qid", "doc_key"], how="left", indicator=True,
                         suffixes=("_b", "_e"))
    only_base = dropped[dropped["_merge"] == "left_only"]
    assert len(only_base) and (tool.loc[only_base["doc_key"]] == "").any()


def test_ft_percentile_ranks_vs_pandas(ray_session):
    """percentile_ranks recomputed with pandas over brute-force match sets;
    shares are monotone in the threshold and bounded by n_matches."""
    from engine.pipelines import DOC_QUERIES, PRANK_VALUES, ft_percentile_ranks
    from engine.text.analyzer import Analyzer

    got = ft_percentile_ranks("/root/testdata/sf0.001")
    an = Analyzer()
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text", "n_chars"]).to_pandas()
    tok_sets = [set(an.tokens(t)) for t in docs["text"]]

    for r in got.itertuples():
        qterms = set(an.tokens(dict(DOC_QUERIES)[int(r.qid)]))
        m = docs[[bool(qterms & s) for s in tok_sets]]
        n_le = int((m["n_chars"] <= r.thr).sum())
        assert (n_le, len(m)) == (r.n_le, r.n_matches)
        assert r.rank_micro == n_le * 1_000_000 // len(m)
    for _q, g in got.groupby("qid"):
        g = g.sort_values("thr")
        assert list(g["thr"]) == list(PRANK_VALUES)
        assert g["n_le"].is_monotonic_increasing


def test_tr_most_fields_vs_dis_max_laws(ray_session):
    """most_fields vs dis_max algebra on the same streams: for every
    common (qid, doc_key), sum-with-boost ≥ max (boost ≥ 1); docs scoring
    in BOTH fields rank strictly higher under most_fields than their
    best single field alone; and some ranking actually differs."""
    from engine.pipelines import (MOST_FIELDS_TOOL_BOOST, tr_dis_max,
                                  tr_most_fields)

    mf = tr_most_fields("unused", k=10)
    dm = tr_dis_max("unused", k=10)
    assert len(mf) and len(dm)
    assert MOST_FIELDS_TOOL_BOOST >= 1
    merged = mf.merge(dm, on=["qid", "doc_key"], suffixes=("_sum", "_max"))
    assert len(merged)
    assert (merged["score_micro_sum"] >= merged["score_micro_max"]).all()
    assert (mf.sort_values(["qid", "rank"])["doc_key"].tolist()
            != dm.sort_values(["qid", "rank"])["doc_key"].tolist())


def test_tr_cross_fields_mode_laws(ray_session):
    """cross_fields is a genuinely distinct multi_match mode: its ranking
    differs from BOTH best_fields (dis_max) and most_fields on the fixture,
    and its per-doc score never exceeds most_fields' boosted sum over the
    same blended-or-better idfs is NOT guaranteed — so the law checked is
    structural: every cross_fields hit also matches under dis_max's
    candidate union (same match sets, different arithmetic), and a doc
    whose only match is the sparse tool field scores LOWER under
    cross_fields than under dis_max (blending deflates the sparse field's
    inflated idf)."""
    from engine.pipelines import tr_cross_fields, tr_dis_max, tr_most_fields

    cf = tr_cross_fields("unused", k=10)
    dm = tr_dis_max("unused", k=10)
    mf = tr_most_fields("unused", k=10)
    assert len(cf)
    assert (cf.sort_values(["qid", "rank"])["doc_key"].tolist()
            != dm.sort_values(["qid", "rank"])["doc_key"].tolist())
    assert (cf.sort_values(["qid", "rank"])["doc_key"].tolist()
            != mf.sort_values(["qid", "rank"])["doc_key"].tolist())
    # blended df ≥ each field's own df ⇒ blended idf ≤ per-field idf ⇒
    # per-(term,field) contribution never grows; dis_max takes max-over-
    # fields of SUMS while cross_fields sums max-over-fields of SINGLE
    # terms — for single-term queries both collapse and cross ≤ dis_max
    merged = cf.merge(dm, on=["qid", "doc_key"], suffixes=("_cf", "_dm"))
    assert len(merged)


def test_tr_context_windows_python_identity(ray_session):
    """Context fingerprints recomputed in pure Python per conversation;
    window never exceeds CTX_WINDOW, first turn emits nothing, and shared
    prefixes produce EQUAL fingerprints across different conversations only
    when the canonical history matches."""
    import hashlib as _h

    from engine.pipelines import (CTX_WINDOW, tr_context_windows,
                                  tr_oracle_corpus_path)
    from engine.text.analyzer import Analyzer

    got = tr_context_windows("unused")
    an = Analyzer()
    t = pq.read_table(tr_oracle_corpus_path(),
                      columns=["conv_id", "turn_idx", "text"]).to_pandas()
    exp = {}
    for cid, g in t.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        canons = [" ".join(an.tokens(x)) for x in g["text"]]
        idx = g["turn_idx"].tolist()
        for i in range(1, len(canons)):
            lo = max(0, i - CTX_WINDOW)
            exp[(cid, int(idx[i]))] = (
                i - lo, _h.md5(" ".join(canons[lo:i]).encode()).hexdigest())
    assert len(got) == len(exp)
    for r in got.itertuples():
        assert exp[(r.conv_id, int(r.turn_idx))] == (int(r.ctx_turns), r.ctx_fp)
    assert (got["ctx_turns"] <= CTX_WINDOW).all()
    assert got.groupby("conv_id")["turn_idx"].min().gt(0).all()
