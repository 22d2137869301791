"""URL parsing column expressions (SURVEY §2.8 F1-F3).

Behavioral parity with the reference's parser
(plugins/EPrints/Plugin/Stats/Utils.pm:489-522):

- ``parse_url``: bare digits => ('http', 'localhost', '/<n>'); a value with
  no ':' gets an implicit 'http://'; then one greedy regex splits
  (protocol, hostname, uri). The protocol group is the longest dot-free
  prefix ending at a colon (so 'info:oai:x' parses protocol='info:oai'),
  the hostname group only matches [a-z0-9.-], and a port (':...') is
  folded into the uri remainder.
- ``get_param``: value of ``p=...`` in a uri, terminated by '&' OR '.'
  (the reference quirk — keep it).

All pure Catalyst expressions (regexp_extract / when) — no UDFs, fully
codegen'd and pushdown-safe at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Java-regex equivalent of the reference's parse regex (Utils.pm:506).
_URL_RE = r"^([^.]*):/?/?([a-z0-9.\-]*):?(/?.*)$"


def _prepared(url: Column) -> Column:
    """Newline strip + implicit http:// + bare-number special case."""
    stripped = F.regexp_replace(url, r"\r?\n", "")
    return (
        F.when(stripped.rlike(r"^[0-9]+$"), F.concat(F.lit("http://localhost/"), stripped))
        .when(~stripped.contains(":"), F.concat(F.lit("http://"), stripped))
        .otherwise(stripped)
    )


def url_protocol(url: Column) -> Column:
    return F.regexp_extract(_prepared(url), _URL_RE, 1)


def url_hostname(url: Column) -> Column:
    return F.regexp_extract(_prepared(url), _URL_RE, 2)


def url_uri(url: Column) -> Column:
    return F.regexp_extract(_prepared(url), _URL_RE, 3)


def get_param(uri: Column, param: str) -> Column:
    """F3 (Utils.pm:511-522): first ``param=`` value, stopping at & or '.'.
    Returns NULL (not '') when the parameter is absent, matching the
    reference's undef."""
    pat = f"{param}=([^&.]*)"
    return F.when(uri.rlike(pat), F.regexp_extract(uri, pat, 1))


# Tracking parameters every web-corpus canonicalizer strips (anchored:
# the whole param name must match, values irrelevant).
_TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid)(=|$)"


def canonicalize_url(url: Column) -> Column:
    """Canonical URL form for web-corpus dedup (beyond the reference's
    parser): two page fetches that differ only in scheme/host case,
    default port, fragment, tracking parameters, query-parameter order,
    or trailing slashes are the SAME document, and URL-keyed dedup must
    see one key for them.

    Rules (each engine-portable — the DuckDB oracle mirrors all of them):
    lowercase scheme (default http when absent) and host; drop the
    fragment; strip :80/:443 when they are the scheme default; trim
    trailing slashes off the path ('' -> '/'); drop utm_*/fbclid/gclid/
    msclkid params; sort surviving params byte-wise and rejoin.

    Pure string/array expressions — fuses into the scan, so
    canonicalization is free relative to the dedup's own shuffle.
    """
    u = F.regexp_replace(F.trim(url), r"#.*$", "")
    scheme_raw = F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)
    scheme = F.when(scheme_raw == "", F.lit("http")).otherwise(F.lower(scheme_raw))
    rest = F.when(scheme_raw == "", u).otherwise(
        F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    )
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    host = (
        F.when(
            (scheme == "http") & hostport.endswith(":80"),
            F.regexp_replace(hostport, ":80$", ""),
        )
        .when(
            (scheme == "https") & hostport.endswith(":443"),
            F.regexp_replace(hostport, ":443$", ""),
        )
        .otherwise(hostport)
    )
    tail = F.substr(rest, F.length(hostport) + 1)
    path = F.regexp_extract(tail, r"^([^?]*)", 1)
    query = F.when(
        F.length(tail) > F.length(path), F.substr(tail, F.length(path) + 2)
    ).otherwise(F.lit(""))
    path_c = F.regexp_replace(path, r"/+$", "")
    path_c = F.when(path_c == "", F.lit("/")).otherwise(path_c)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (F.length(p) > 0) & ~p.rlike(_TRACKING_PARAM_RE),
    )
    qs = F.array_join(F.sort_array(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path_c,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )


def percent_decode(col: Column) -> Column:
    """F2: %XX unescape (Referrer.pm:49-50). ``url_decode`` also translates
    '+' to space, which the reference does NOT do — protect '+' first."""
    plus_safe = F.regexp_replace(col, r"\+", "%2B")
    return F.url_decode(F.regexp_replace(plus_safe, "%(?![0-9A-Fa-f]{2})", "%25"))
