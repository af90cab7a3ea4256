"""Search family (operators/search.py) vs a sequential Python
reference: positional postings, boolean AND, phrase match (overlap
semantics), and BM25 with the integer micro-nat discipline."""

import math

import pytest

from dxnn_ocr_cpp_spark.operators.search import (
    BM25_B, BM25_K1, IDF_MICRO_SCALE, bm25_topk, boolean_and,
    build_postings, phrase_match)

DOCS = [
    (1, "a a a table fast"),
    (2, "table fast scan"),
    (3, "fast table  FAST  table fast"),   # normalizes + collapses ws
    (4, ""),
    (5, "scan scan table"),
    (6, "   "),
    (7, "unique"),
]


def norm_tokens(text):
    t = text.strip().lower().split()
    return t


def ref_postings():
    out = {}
    for did, text in DOCS:
        for pos, tok in enumerate(norm_tokens(text)):
            out.setdefault((tok, did), []).append(pos)
    return out


def ref_phrase_starts(tokens, phrase):
    k = len(phrase)
    return sum(1 for i in range(len(tokens) - k + 1)
               if tokens[i:i + k] == phrase)


def ref_bm25(terms, k):
    n_docs = len(DOCS)
    toks = {did: norm_tokens(t) for did, t in DOCS}
    dls = {did: len(t) for did, t in toks.items()}
    avgdl = sum(dls.values()) / n_docs
    uniq = sorted(set(terms))
    dfs = {t: sum(1 for tk in toks.values() if t in tk) for t in uniq}
    scores = {}
    for did, tk in toks.items():
        s, hit = 0, 0
        for t in uniq:
            tf = tk.count(t)
            if not tf:
                continue
            hit += 1
            idf_micro = round(math.log(
                (n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
                * IDF_MICRO_SCALE)
            frac = tf * (BM25_K1 + 1.0) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dls[did] / avgdl))
            s += round(idf_micro * frac)
        if hit:
            scores[did] = (s, hit)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[:k]
    return [(did, s, hit, r + 1)
            for r, (did, (s, hit)) in enumerate(ranked)]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture(scope="module")
def postings(docs_df):
    return build_postings(docs_df).cache()


def test_postings_match_reference(postings):
    got = {(r["token"], r["doc_id"]): (r["tf"], list(r["positions"]))
           for r in postings.collect()}
    want = {k: (len(v), v) for k, v in ref_postings().items()}
    assert got == want          # empty/ws-only docs contribute nothing


def test_boolean_and(postings):
    got = sorted(r["doc_id"] for r in
                 boolean_and(postings, ["table", "fast"]).collect())
    assert got == [1, 2, 3]
    # duplicate query terms collapse: AND(x, x) == AND(x)
    got1 = sorted(r["doc_id"] for r in
                  boolean_and(postings, ["scan", "scan"]).collect())
    assert got1 == [2, 5]
    # term absent from corpus -> empty, not error
    assert boolean_and(postings, ["table", "nosuch"]).count() == 0


@pytest.mark.parametrize("phrase", [
    ["a", "a"],                    # overlapping starts count (doc 1: 2)
    ["table", "fast"],
    ["fast", "table", "fast"],     # doc 3 has 2 overlapping starts
    ["scan", "scan"],
    ["unique"],                    # single-token phrase
    ["table", "nosuch"],           # no match
])
def test_phrase_match_reference(postings, phrase):
    got = {r["doc_id"]: r["n_starts"]
           for r in phrase_match(postings, phrase).collect()}
    want = {}
    for did, text in DOCS:
        n = ref_phrase_starts(norm_tokens(text), phrase)
        if n:
            want[did] = n
    assert got == want


def test_phrase_rejects_empty(postings):
    with pytest.raises(ValueError):
        phrase_match(postings, [])


@pytest.mark.parametrize("terms,k", [
    (["table", "scan"], 5),
    (["fast"], 3),
    (["table", "fast", "scan", "unique"], 10),
    (["nosuch"], 5),
])
def test_bm25_integer_exact(docs_df, terms, k):
    got = [(r["doc_id"], r["score_micro"], r["n_terms_hit"], r["rank"])
           for r in bm25_topk(docs_df, terms, k=k)
           .orderBy("rank").collect()]
    assert got == ref_bm25(terms, k)


def test_bm25_plan_no_global_window_shuffle(docs_df):
    """Top-k must be TakeOrderedAndProject (distributed partial top-k),
    never a single-partition global window over all matches."""
    plan = bm25_topk(docs_df, ["table", "scan"], k=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
