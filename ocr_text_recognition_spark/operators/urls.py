"""URL canonicalization — the first dedup a web-scale crawl pipeline
runs, BEFORE any content is fetched or hashed.

The same page hides behind many spellings: scheme/host case, an
explicit default port, a ``www.`` prefix, a trailing slash, tracking
params (``utm_*``), param order, and fragments. Canonicalizing to one
spelling collapses them with a plain string groupBy — no fetch, no
content hash, no similarity join. Everything here is built-in string /
array expressions (``regexp_extract`` + ``split`` + ``filter`` +
``array_sort``), so the whole normalization is a zero-shuffle narrow
map that stays inside whole-stage codegen; the only shuffle a URL
dedup pays is the final groupBy on the canonical string.

Rules applied (the conservative, semantics-preserving subset):
scheme/host lowercased; ``www.`` prefix dropped; default ports
(http:80, https:443) dropped, other ports kept; fragment dropped;
trailing slashes trimmed (root stays ``/``, empty path becomes ``/``);
query params split on ``&``, empties and ``utm_*`` trackers dropped,
survivors sorted codepoint-wise and rejoined. Path case is preserved
(paths are case-sensitive per RFC 3986; hosts are not).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def canonical_url(url: Column) -> Column:
    """Canonical spelling of an absolute http(s) URL expression."""
    no_frag = F.split(url, "#").getItem(0)
    scheme = F.lower(F.regexp_extract(no_frag, r"^([a-zA-Z]+)://", 1))
    auth = F.regexp_extract(no_frag, r"^[a-zA-Z]+://([^/?#]+)", 1)
    rest = F.regexp_replace(no_frag, r"^[a-zA-Z]+://[^/?#]+", "")

    port = F.regexp_extract(auth, r":([0-9]+)$", 1)
    host = F.lower(F.regexp_replace(auth, r":[0-9]+$", ""))
    host = F.regexp_replace(host, r"^www\.", "")
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        (port == "") | default, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))

    path = F.split(rest, r"\?").getItem(0)
    path = F.regexp_replace(path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)

    qs = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != "") & (~p.startswith("utm_")),
        )
    )
    q_part = F.when(F.size(params) == 0, F.lit("")).otherwise(
        F.concat(F.lit("?"), F.array_join(params, "&"))
    )

    return F.concat(scheme, F.lit("://"), host, port_part, path, q_part)


def url_dedup(
    df: DataFrame, url_col: str, id_col: str
) -> DataFrame:
    """Collapse URL spellings: one row per canonical URL with the
    number of raw spellings seen and the smallest id as the canonical
    representative (deterministic survivor, same convention as the
    content-dedup operators)."""
    return (
        df.select(
            canonical_url(F.col(url_col)).alias("canonical"),
            F.col(id_col).alias("_id"),
        )
        .groupBy("canonical")
        .agg(
            F.count("*").alias("n_raw"),
            F.min("_id").alias("canonical_id"),
        )
    )
