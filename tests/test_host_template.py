"""Host-scoped template removal (curation.remove_host_template_lines).

The per-site companion of remove_boilerplate_lines: frequency is
counted within (host, line), so a site template that repeats on every
page of one host is dropped there while the identical line on a host
where it is rare survives — the property the corpus-wide gate cannot
express.
"""

import pytest
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.operators.curation import \
    remove_host_template_lines


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, host string, text string")


@pytest.fixture(scope="module")
def two_hosts(spark):
    # host A: 4 pages — 'nav menu' on all 4 (frac 1.0), 'mid banner'
    # on 2 of 4 (frac 0.5), 'promo' on 1 (frac 0.25, under df_floor).
    # host B: 2 pages — 'nav menu' on 1 of 2: frac 0.5 BUT df=1 is
    # below the singleton floor, so it must survive there.
    rows = [
        (0, "a", "nav menu\nmid banner\nbody zero"),
        (1, "a", "nav menu\nmid banner\nbody one\npromo"),
        (2, "a", "nav menu\nbody two"),
        (3, "a", "nav menu\nbody three"),
        (10, "b", "nav menu\nbody ten"),
        (11, "b", "body eleven"),
    ]
    return _df(spark, rows)


class TestFracMode:
    def test_scoped_frequency(self, spark, two_hosts):
        got = {r["doc_id"]: r for r in remove_host_template_lines(
            two_hosts, min_frac=0.6).collect()}
        # host a: nav frac 1.0 >= 0.6 dropped; mid 0.5 < 0.6 kept
        assert got[1]["text_clean"] == "mid banner\nbody one\npromo"
        assert got[0]["text_clean"] == "mid banner\nbody zero"
        assert got[0]["n_dropped"] == 1
        # host b: nav frac 0.5 < 0.6 -> survives on host b ONLY
        assert got[10]["text_clean"] == "nav menu\nbody ten"
        assert got[11]["text_clean"] == "body eleven"

    def test_boundary_inclusive(self, spark, two_hosts):
        got = {r["doc_id"]: r for r in remove_host_template_lines(
            two_hosts, min_frac=0.5).collect()}
        # at 0.5, host a's mid banner (df 2/4, exactly the threshold
        # and at the floor) is dropped too
        assert got[0]["text_clean"] == "body zero"
        assert got[1]["text_clean"] == "body one\npromo"

    def test_singleton_floor(self, spark, two_hosts):
        # even an absurdly low frac never erases unique content:
        # df=1 lines sit below df_floor=2 on every host, so host b's
        # page survives intact while host a's true templates
        # (nav df=4, mid df=2) still drop
        got = {r["doc_id"]: r for r in remove_host_template_lines(
            two_hosts, min_frac=0.01).collect()}
        assert got[10]["text_clean"] == "nav menu\nbody ten"
        assert got[11]["text_clean"] == "body eleven"
        assert got[1]["text_clean"] == "body one\npromo"


class TestDfMode:
    def test_min_df(self, spark, two_hosts):
        got = {r["doc_id"]: r for r in remove_host_template_lines(
            two_hosts, min_df=4, min_frac=None).collect()}
        # nav df=4 on host a drops; mid df=2 < 4 survives
        assert got[0]["text_clean"] == "mid banner\nbody zero"
        assert got[10]["text_clean"] == "nav menu\nbody ten"  # df 1 on b

    def test_param_validation(self, spark, two_hosts):
        with pytest.raises(ValueError, match="exactly one"):
            remove_host_template_lines(two_hosts, min_df=2, min_frac=0.5)
        with pytest.raises(ValueError, match="exactly one"):
            remove_host_template_lines(two_hosts, min_df=None,
                                       min_frac=None)


class TestEdges:
    def test_blank_lines_kept_in_place(self, spark):
        df = _df(spark, [(0, "a", "t\n\nbody"), (1, "a", "t\n\nother")])
        got = {r["doc_id"]: r for r in remove_host_template_lines(
            df, min_frac=0.5).collect()}
        # 't' is template (df 2/2); blanks survive in position
        assert got[0]["text_clean"] == "\nbody"
        assert got[0]["n_lines"] == 3 and got[0]["n_dropped"] == 1

    def test_all_template_doc_emits_empty(self, spark):
        df = _df(spark, [(0, "a", "t"), (1, "a", "t"), (2, "a", "t\nu")])
        got = {r["doc_id"]: r for r in remove_host_template_lines(
            df, min_frac=0.9).collect()}
        assert got[0]["text_clean"] == ""
        assert got[0]["n_dropped"] == 1
        assert got[2]["text_clean"] == "u"

    def test_partitioning_invariance(self, spark, two_hosts):
        a = sorted(remove_host_template_lines(
            two_hosts.repartition(1), min_frac=0.5).collect())
        b = sorted(remove_host_template_lines(
            two_hosts.repartition(7), min_frac=0.5).collect())
        assert a == b
