"""URL canonicalization — the dedup-key normalizer every web-scale
pipeline runs before url-level dedup / frontier merging (the CCNet/C4
step; reference analog: request-path normalization in
/root/reference/server/file_handler.h:25-38, which canonicalizes
incoming resource paths before lookup).

Pure Catalyst column expressions (zero shuffle, whole-stage codegen);
every regex stays in the Java/RE2 common subset so the DuckDB oracle
replays the IDENTICAL pattern strings (the discipline established in
curation.redact_pii).

Policy (deterministic, minimal, documented):
  - strip the #fragment
  - lowercase scheme and authority (host is case-insensitive per
    RFC 3986 §6.2.2.1; path/query case is preserved — significant)
  - drop the default port for the scheme (http:80, https:443)
  - empty path -> '/'
  - query: split on '&', drop empty params and tracking params
    (utm_*, fbclid, gclid, msclkid, mc_cid, mc_eid), sort the rest
    lexicographically (RFC 3986 §6.2.2 allows scheme-specific
    normalization; param order is almost never significant), re-join;
    an emptied query drops the '?'
  - anything that does not parse as scheme://authority... is returned
    UNCHANGED (null-safe: null in, null out)
"""

from __future__ import annotations

from pyspark.sql import functions as F

# kept in ONE place: the Spark expression and the DuckDB oracle SQL
# (oracle_url_sql) both interpolate these exact strings
SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
AUTHORITY_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
QUERY_RE = r"\?([^#]*)"
TRACKING_RE = r"^(utm_[a-z0-9]+|fbclid|gclid|msclkid|mc_cid|mc_eid)="


def canonical_url(url_col):
    """Column: canonical form of `url_col` per the module policy."""
    if isinstance(url_col, str):
        url_col = F.col(url_col)
    u = F.regexp_replace(url_col, r"#.*$", "")   # fragment never survives
    scheme = F.lower(F.regexp_extract(u, SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(u, AUTHORITY_RE, 1))
    strip80 = (scheme == "http") & auth.endswith(":80")
    strip443 = (scheme == "https") & auth.endswith(":443")
    auth = (F.when(strip80, F.substring(auth, 1, F.length(auth) - 3))
             .when(strip443, F.substring(auth, 1, F.length(auth) - 4))
             .otherwise(auth))
    path = F.regexp_extract(u, PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.array_join(
        F.array_sort(F.filter(
            F.split(F.regexp_extract(u, QUERY_RE, 1), "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_RE))),
        "&")
    rebuilt = F.concat(
        scheme, F.lit("://"), auth, path,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)))
    return F.when(scheme == "", url_col).otherwise(rebuilt)


def oracle_url_sql(expr: str) -> str:
    """DuckDB scalar expression mirroring canonical_url(expr) — the
    same regex strings, the same branch structure."""
    u = f"regexp_replace({expr}, '#.*$', '')"
    scheme = f"lower(regexp_extract({u}, '{SCHEME_RE}', 1))"
    auth0 = f"lower(regexp_extract({u}, '{AUTHORITY_RE}', 1))"
    auth = (
        f"CASE WHEN {scheme} = 'http' AND {auth0} LIKE '%:80' "
        f"THEN {auth0}[1:-4] "
        f"WHEN {scheme} = 'https' AND {auth0} LIKE '%:443' "
        f"THEN {auth0}[1:-5] ELSE {auth0} END")
    path0 = f"regexp_extract({u}, '{PATH_RE}', 1)"
    path = f"CASE WHEN {path0} = '' THEN '/' ELSE {path0} END"
    # coalesce: DuckDB's array_to_string over a fully-filtered-out list
    # yields NULL, not '' (Spark's array_join yields '')
    q = (f"coalesce(array_to_string(list_sort(list_filter("
         f"string_split(regexp_extract({u}, '\\?([^#]*)', 1), '&'), "
         f"p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_RE}'))), '&'), '')")
    rebuilt = (f"{scheme} || '://' || {auth} || {path} || "
               f"CASE WHEN {q} = '' THEN '' ELSE '?' || {q} END")
    return f"CASE WHEN {scheme} = '' THEN {expr} ELSE {rebuilt} END"
