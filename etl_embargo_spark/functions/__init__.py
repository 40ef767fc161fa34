"""Scalar function layer (SURVEY.md §2.6).

Everything here is a Column-expression builder over built-in
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen friendly — except
the IPv6 normalizer, which is the one genuinely non-built-in scalar and is a
vectorized Pandas UDF (SURVEY F3).
"""

from etl_embargo_spark.functions.filenames import (
    basename,
    date_as_int,
    date_path,
    embargo_rename,
    filename_date,
    filename_local_ip,
    one_year_before,
    parse_date_int,
    url_filename_decode,
)
from etl_embargo_spark.functions.ipv6 import normalize_ipv6, normalize_ipv6_py

__all__ = [
    "basename",
    "date_as_int",
    "date_path",
    "embargo_rename",
    "filename_date",
    "filename_local_ip",
    "one_year_before",
    "parse_date_int",
    "url_filename_decode",
    "normalize_ipv6",
    "normalize_ipv6_py",
]
