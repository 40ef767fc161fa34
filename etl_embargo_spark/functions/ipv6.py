"""F3 — IPv6 normalization for sidestream's malformed filenames.

Sidestream writes ``::`` as ``:::`` inside filenames, so the reference routes
every extracted IP through m-lab/etl/web100's normalizer
(/root/reference/filename_parser.go:23-27; test case
/root/reference/filename_parser_test.go:22-24:
``2001:4c08:2003:3f:::230`` → ``2001:4c08:2003:3f::230``), counting errors in
a Prometheus counter.

This is the one scalar in the whole surface that needs Python (RFC 5952
canonicalization), so it is a vectorized Pandas UDF: Arrow moves string
batches, ``ipaddress`` canonicalizes per element, errors become nulls (the
relational analog of the reference's error counter — count nulls downstream).
IPv4 strings pass through untouched, as in the reference (its normalizer is
only applied to strings containing ':').
"""

from __future__ import annotations

import ipaddress

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def normalize_ipv6_py(value: str | None) -> str | None:
    """Pure-Python kernel: canonicalize one IP string, None on failure.

    The ``:::`` → ``::`` pre-repair mirrors the sidestream quirk; full
    canonicalization (leading zeros, longest-zero-run compression) comes from
    ``ipaddress.ip_address`` which implements RFC 5952.
    """
    if value is None or value == "":
        return None
    if ":" not in value:
        # IPv4 (or dotted garbage): the reference does not touch it.
        return value
    repaired = value.replace(":::", "::")
    try:
        return str(ipaddress.ip_address(repaired))
    except ValueError:
        return None


@F.pandas_udf(StringType())
def _normalize_ipv6_udf(s: pd.Series) -> pd.Series:
    return s.map(normalize_ipv6_py)


def normalize_ipv6(col: Column | str) -> Column:
    """Column form of F3: canonicalized IP, null when unparseable."""
    return _normalize_ipv6_udf(F.col(col) if isinstance(col, str) else col)
