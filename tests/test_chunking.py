"""Token-window chunking: boundary arithmetic, overlap, degenerate
docs, zero-shuffle plan."""

import pytest

from dxnn_ocr_cpp_spark.operators.chunking import chunk_documents


@pytest.fixture(scope="module")
def chunks(spark):
    words = " ".join(f"w{i}" for i in range(25))       # 25 tokens
    docs = spark.createDataFrame(
        [(1, words),
         (2, "a b c"),          # short: one chunk
         (3, ""),               # empty: no chunks
         (4, None),             # null: no chunks
         (5, "  x  "),          # whitespace padding: one 1-token chunk
         (6, " ".join(f"t{i}" for i in range(10)))],   # exactly stride-ish
        "doc_id long, text string")
    df = chunk_documents(docs, max_tokens=10, overlap=2)
    rows = df.collect()
    return df, {(r["doc_id"], r["chunk_id"]): r for r in rows}


def test_chunk_count_and_boundaries(chunks):
    # 25 tokens, max 10, stride 8 -> ceil((25-2)/8) = 3 chunks
    _, got = chunks
    ids = sorted(c for (d, c) in got if d == 1)
    assert ids == [0, 1, 2]
    assert got[(1, 0)]["chunk_text"].split() == [f"w{i}" for i in range(10)]
    assert got[(1, 1)]["chunk_text"].split() == [f"w{i}" for i in range(8, 18)]
    assert got[(1, 2)]["chunk_text"].split() == [f"w{i}" for i in range(16, 25)]
    assert got[(1, 2)]["n_tokens"] == 9                # short last chunk


def test_overlap_tokens_shared(chunks):
    _, got = chunks
    a = got[(1, 0)]["chunk_text"].split()
    b = got[(1, 1)]["chunk_text"].split()
    assert a[-2:] == b[:2]                             # overlap = 2


def test_degenerate_docs(chunks):
    _, got = chunks
    assert [k for k in got if k[0] == 3] == []         # empty -> none
    assert [k for k in got if k[0] == 4] == []         # null -> none
    assert got[(2, 0)]["n_tokens"] == 3
    assert got[(5, 0)]["chunk_text"] == "x"
    assert len([k for k in got if k[0] == 6]) == 1     # 10 tokens = 1 chunk


def test_bad_params_raise(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=8, overlap=8)


def test_zero_shuffle_no_python_plan(chunks):
    df, _ = chunks
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
