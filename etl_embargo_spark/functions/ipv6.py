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


def _make_udf():
    """Build the Pandas UDF with a self-contained kernel.

    The kernel is nested (not a module-level reference) so cloudpickle
    serializes it by value — executors never need this package importable
    (same policy as sources/tar_source.py).
    """

    def _kernel(s):
        import ipaddress as _ipaddress

        def norm(value):
            if value is None or value == "":
                return None
            if ":" not in value:
                return value
            try:
                return str(_ipaddress.ip_address(value.replace(":::", "::")))
            except ValueError:
                return None

        return s.map(norm)

    return F.pandas_udf(_kernel, StringType())


def normalize_ipv6(col: Column | str) -> Column:
    """Column form of F3: canonicalized IP, null when unparseable."""
    return _make_udf()(F.col(col) if isinstance(col, str) else col)
