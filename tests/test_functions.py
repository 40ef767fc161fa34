"""Scalar-function unit tests, mirroring the reference's tier-1 suite
(/root/reference/filename_parser_test.go, embargo_check_test.go).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _one(spark, col, value: str | None):
    df = spark.createDataFrame([(value,)], "name string")
    return df.select(col.alias("out")).first()["out"]


class TestFilenameLocalIP:
    """F2 — filename_parser_test.go:9-27 cases."""

    def test_ipv4(self, spark):
        from etl_embargo_spark.functions.filenames import filename_local_ip

        assert (
            _one(spark, filename_local_ip("name"),
                 "20170225T23:00:00Z_4.34.58.34_0.web100")
            == "4.34.58.34"
        )

    def test_old_format_returns_empty(self, spark):
        from etl_embargo_spark.functions.filenames import filename_local_ip

        # filename_parser.go:20-22: fewer than two underscores → ""
        assert (
            _one(spark, filename_local_ip("name"),
                 "20170225T23:00:00Z_ALL0.web100")
            == ""
        )

    def test_ipv6_raw_extract(self, spark):
        from etl_embargo_spark.functions.filenames import filename_local_ip

        assert (
            _one(spark, filename_local_ip("name"),
                 "20170225T23:00:00Z_2001:4c08:2003:3f:::230_0.web100")
            == "2001:4c08:2003:3f:::230"
        )


class TestNormalizeIPv6:
    """F3 — the ::: sidestream quirk (filename_parser_test.go:22-24)."""

    def test_triple_colon(self):
        from etl_embargo_spark.functions.ipv6 import normalize_ipv6_py

        assert (
            normalize_ipv6_py("2001:4c08:2003:3f:::230")
            == "2001:4c08:2003:3f::230"
        )

    def test_ipv4_passthrough(self):
        from etl_embargo_spark.functions.ipv6 import normalize_ipv6_py

        assert normalize_ipv6_py("4.34.58.34") == "4.34.58.34"

    def test_garbage_is_null(self):
        from etl_embargo_spark.functions.ipv6 import normalize_ipv6_py

        assert normalize_ipv6_py("not:an:ip::::::") is None
        assert normalize_ipv6_py("") is None
        assert normalize_ipv6_py(None) is None

    def test_udf_column_form(self, spark):
        from etl_embargo_spark.functions.ipv6 import normalize_ipv6

        out = _one(spark, normalize_ipv6("name"), "2001:4c08:2003:3f:::230")
        assert out == "2001:4c08:2003:3f::230"


class TestDateFunctions:
    def test_filename_date(self, spark):
        from etl_embargo_spark.functions.filenames import filename_date

        assert (
            _one(spark, filename_date("name"),
                 "20170315T000000Z-mlab3-sea03-sidestream-0000.tgz")
            == "20170315"
        )

    def test_parse_date_int_bad_input_is_null(self, spark):
        from etl_embargo_spark.functions.filenames import parse_date_int

        # strconv.Atoi error path (embargo.go:272-276) → null
        assert _one(spark, parse_date_int("name"), "notadate.tgz") is None

    def test_embargo_rename(self, spark):
        from etl_embargo_spark.functions.filenames import embargo_rename

        assert (
            _one(spark, embargo_rename("name"), "a/b/x-0000.tgz")
            == "a/b/x-0000-e.tgz"
        )
        # non-suffix occurrence untouched (documented deviation: anchored)
        assert _one(spark, embargo_rename("name"), "x.tgz.bak") == "x.tgz.bak"

    def test_date_path(self, spark):
        from etl_embargo_spark.functions.filenames import date_path

        assert (
            _one(spark, date_path("name"), "20170315")
            == "sidestream/2017/03/15"
        )

    def test_basename(self, spark):
        from etl_embargo_spark.functions.filenames import basename

        assert (
            _one(spark, basename("name"), "2017/03/15/mlab3.sea03/x.web100")
            == "x.web100"
        )
        assert _one(spark, basename("name"), "plain.web100") == "plain.web100"

    def test_url_filename_decode(self, spark):
        import base64

        from etl_embargo_spark.functions.filenames import url_filename_decode

        url = "gs://bucket/sidestream/2017/03/15/archive.tgz"
        b64 = base64.urlsafe_b64encode(url.encode()).decode()
        assert _one(spark, url_filename_decode("name"), b64) == url


class TestSitesPipeline:
    """embargo_check_test.go:23-47 — FilterSiteIPs on an inline 3-site JSON."""

    def test_whitelist_from_sites(self, spark):
        from etl_embargo_spark.sources.json_source import (
            sites_json_from_string,
            whitelist_from_sites,
        )

        payload = """
        [
          {"hostname": "mlab2.samknows.acc02.measurement-lab.org",
           "ipv4": "196.49.14.227", "ipv6": ""},
          {"hostname": "mlab3.acc02.measurement-lab.org",
           "ipv4": "196.49.14.242", "ipv6": "2001:4c08::242"},
          {"hostname": "mlab1.acc02.measurement-lab.org",
           "ipv4": "", "ipv6": ""}
        ]
        """
        sites = sites_json_from_string(spark, payload)
        wl = whitelist_from_sites(sites)
        ips = {r["ip"] for r in wl.collect()}
        # samknows host excluded; empty IPs dropped → 2 IPs
        assert ips == {"196.49.14.242", "2001:4c08::242"}
