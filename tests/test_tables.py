"""HTML table extraction: cell order across mixed th/td, inner-tag
stripping, entity decode, flat-table policy under nesting, absence of
output for table-less docs, and the zero-shuffle/zero-Python plan pin.
"""

import pytest
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.operators.tables import extract_tables

DOCS = [
    # mixed header/data row + inner markup + entities + sloppy close
    (0, '<body><TABLE border=1>'
        "<tr><TH>Name</th><td> Ada &amp; co </td></tr>"
        "<tr><td>a<br>b</td><td><b>x</b> y</td></tr >"
        "</table ></body>"),
    # two tables; second has a th-only header row
    (1, "<table><tr><td>t0</td></tr></table>"
        "<p>between</p>"
        "<table><tr><th>H1</th><th>H2</th></tr>"
        "<tr><td>1</td><td>2</td></tr></table>"),
    # no table at all -> no output rows
    (2, "<body><p>prose only</p></body>"),
    # nested table: outer capture truncates at the INNER close (flat
    # policy) — the inner's row is what survives
    (3, "<table><tr><td><table><tr><td>in</td></tr></table>"
        "</td></tr></table>"),
    # row with no cells -> n_cells 0, empty join
    (4, "<table><tr>bare</tr><tr><td>c</td></tr></table>"),
]


@pytest.fixture(scope="module")
def out(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, html string")
    rows = extract_tables(df).collect()
    return sorted(rows, key=lambda r: (r["doc_id"], r["table_idx"],
                                       r["row_idx"]))


def by_doc(out, i):
    return [r for r in out if r["doc_id"] == i]


def test_mixed_row_keeps_cell_order_and_cleans(out):
    r0, r1 = by_doc(out, 0)
    assert r0["cells"] == ["Name", "Ada & co"]
    assert (r0["n_cells"], r0["n_th"]) == (2, 1)
    # <br> and <b> -> space-joined words, never concatenated
    assert r1["cells"] == ["a b", "x y"]
    assert r1["n_th"] == 0


def test_multiple_tables_indexed_in_document_order(out):
    rows = by_doc(out, 1)
    assert [(r["table_idx"], r["row_idx"]) for r in rows] == [
        (0, 0), (1, 0), (1, 1)]
    header = rows[1]
    assert header["n_th"] == 2 and header["cells"] == ["H1", "H2"]


def test_tableless_doc_absent(out):
    assert by_doc(out, 2) == []


def test_nested_table_flat_policy(out):
    rows = by_doc(out, 3)
    # outer body truncates at inner </table>: one row, one cell whose
    # text is the inner cell's text (tags stripped)
    assert len(rows) == 1
    assert rows[0]["cells"] == ["in"]


def test_cell_less_row(out):
    rows = by_doc(out, 4)
    assert (rows[0]["n_cells"], rows[0]["cells"]) == (0, [])
    assert rows[1]["cells"] == ["c"]


def test_plan_zero_shuffle_zero_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, html string")
    plan = (extract_tables(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
