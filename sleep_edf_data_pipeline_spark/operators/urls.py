"""URL canonicalization — the dedup key every crawl pipeline cuts first.

CCNet / RefinedWeb-style corpus construction runs URL-level exact
dedup BEFORE content MinHash: canonicalize each record's URL, group,
keep one survivor per canonical key.  The canonicalizer here is the
standard fold set, expressed entirely in JVM string expressions
(regexp_extract / lower / array_sort — whole-stage codegen, no
Python):

1. drop the fragment (``#...``);
2. drop the scheme (``http://`` / ``https://`` — scheme-insensitive
   keys, the RefinedWeb choice);
3. lowercase the authority and strip a leading ``www.`` (host names
   are case-insensitive per RFC 3986; the PATH keeps its case — it is
   case-sensitive);
4. drop a trailing slash on the path;
5. drop tracking parameters (``utm_*``, ``fbclid``, ``gclid``,
   ``ref``, ``mc_eid``) and SORT the survivors by name, so parameter
   order never splits a key.

At 100 TB this is a pure map stage feeding a hash groupBy — the same
shuffle shape as exact content dedup (operators/dedup.py), with the
canonical string as the key.

Reference parity: no URL surface exists in the reference; extends
SURVEY §2.7's training-data operators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Query parameters that never distinguish content (analytics /
#: click-tracking); one regex, anchored on the param NAME.
TRACKING_PARAM_RE = "^(utm_[^=]*|fbclid|gclid|ref|mc_eid)="


def canonicalize_url(url: Column) -> Column:
    """Canonical dedup key for a raw URL string column (pure JVM)."""
    # 1. fragment off (first '#' to end)
    u = F.regexp_replace(url, "#.*", "")
    # 2. base / query-string split at the first '?'
    base = F.regexp_extract(u, r"^([^?]*)", 1)
    qs = F.regexp_extract(u, r"[?](.*)$", 1)
    # 3. scheme off, authority / path split at the first '/'
    rest = F.regexp_replace(base, "^https?://", "")
    host = F.regexp_extract(rest, r"^([^/]*)", 1)
    path = F.regexp_extract(rest, r"^[^/]*(/.*)?$", 1)
    host = F.regexp_replace(F.lower(host), r"^www\.", "")
    # 4. trailing slash off (root '/' folds to '')
    path = F.regexp_replace(path, "/$", "")
    # 5. tracking params off, survivors sorted by name
    params = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    canon_qs = F.concat_ws("&", params)
    return F.concat(
        host,
        path,
        F.when(canon_qs != "", F.concat(F.lit("?"), canon_qs)).otherwise(
            F.lit("")
        ),
    )
