"""URL canonicalization — the scaled-up OPS-9 (reference
cmd/build_matches_db.py:225-234 does unquote + rsplit('/') + '_'→' ';
a real frontier needs full normalization before hashing into the seen set).

Two implementations that MUST agree byte-for-byte (crawl-order and
seen-set equality are asserted against the pure-Python reference crawler):

- ``canonicalize_cols``: pure Spark column expressions (JVM-side,
  whole-stage codegen — the hot path at 10^10 URLs/wave)
- ``canonicalize_py``:   pure Python (reference model + unit goldens)

Rules: lowercase scheme+host; strip default ports (http:80 / https:443);
strip fragment; drop tracking params (utm_*, fbclid, gclid); empty path →
'/'; empty query → no '?'. Priority is crc32(canonical)/2^32 — identical
in the JVM (F.crc32) and Python (zlib.crc32), so ordering needs no
driver/executor handshake.
"""

from __future__ import annotations

import re
import zlib

from pyspark.sql import Column
from pyspark.sql import functions as F

_TRACKING_RE = r"^(?:utm_[^=]*|fbclid|gclid)="


def canonicalize_cols(url: Column) -> dict[str, Column]:
    """Returns {'canonical', 'host', 'priority'} column expressions."""
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    rest = F.regexp_replace(rest, r"#.*$", "")  # fragment
    hostport = F.regexp_extract(rest, r"^([^/?]+)", 1)
    host = F.lower(F.regexp_extract(hostport, r"^([^:]+)", 1))
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    pathq = F.substring(rest, F.length(hostport) + 1, F.length(rest))
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    query_clean = F.array_join(
        F.filter(F.split(query, "&"), lambda p: ~p.rlike(_TRACKING_RE) & (p != "")),
        "&",
    )
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80")) | ((scheme == "https") & (port == "443"))
    )
    canonical = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(query_clean != "", F.concat(F.lit("?"), query_clean)).otherwise(F.lit("")),
    )
    priority = F.crc32(F.encode(canonical, "utf-8")) / F.lit(2.0**32)
    return {"canonical": canonical, "host": host, "priority": priority}


def canonicalize_py(url: str) -> tuple[str, str, float]:
    """(canonical, host, priority) — must mirror canonicalize_cols."""
    u = url.strip()
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.\-]*)://", u)
    scheme = m.group(1).lower() if m else ""
    rest = re.sub(r"^[A-Za-z][A-Za-z0-9+.\-]*://", "", u)
    rest = re.sub(r"#.*$", "", rest)
    hp = re.match(r"^([^/?]+)", rest)
    hostport = hp.group(1) if hp else ""
    host = re.match(r"^([^:]+)", hostport)
    host = host.group(1).lower() if host else ""
    port_m = re.search(r":([0-9]+)$", hostport)
    port = port_m.group(1) if port_m else ""
    pathq = rest[len(hostport):]
    path_m = re.match(r"^([^?]*)", pathq)
    path = path_m.group(1) if path_m else ""
    if path == "":
        path = "/"
    q_m = re.search(r"\?(.*)$", pathq)
    query = q_m.group(1) if q_m else ""
    parts = [p for p in query.split("&") if p and not re.match(_TRACKING_RE, p)]
    query_clean = "&".join(parts)
    keep_port = port != "" and not (
        (scheme == "http" and port == "80") or (scheme == "https" and port == "443")
    )
    canonical = (
        scheme + "://" + host + ((":" + port) if keep_port else "") + path
        + (("?" + query_clean) if query_clean else "")
    )
    priority = zlib.crc32(canonical.encode("utf-8")) / 2.0**32
    return canonical, host, priority
