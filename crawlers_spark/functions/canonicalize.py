"""URL canonicalization (operator O3, SURVEY.md §2.1).

Re-expresses the reference's dedup-key normalization — Scrapy's
``RFPDupeFilter`` fingerprints requests through ``w3lib.url.
canonicalize_url`` (public semantics: lowercase scheme/host, strip
fragment, drop default port, percent-decode+re-encode, sort query
params) — plus the crawl-hygiene extension mandated by BASELINE.json
("strip fragments/tracking params, percent-decode"):

1.  strip surrounding whitespace; prepend ``http://`` when scheme-less
2.  lowercase scheme and host; strip a single trailing dot on the host
3.  drop the fragment
4.  drop default ports (http:80, https:443)
5.  percent-decode then minimally re-encode path & query (uppercase hex,
    unreserved chars decoded) — idempotent by construction
6.  remove dot segments (RFC 3986 §5.2.4 / §6.2.2.3 path-segment
    normalization: ``/a/../b`` ≡ ``/b``, ``/./x`` ≡ ``/x``) — clients
    resolve these before requesting, so they alias one resource; runs
    after decode so ``%2e%2e`` tricks normalize too
7.  drop tracking params: ``utm_*``, gclid, fbclid, msclkid, yclid,
    mc_cid, mc_eid, igshid, _ga
8.  sort remaining query params by (key, value); drop empty ``?``
9.  empty path → ``/``

Exposed three ways:

- ``canonicalize_series`` — pure pandas Series → Series (unit-testable,
  reused by the pinned oracle extractor fixtures);
- ``canonicalize_udf`` — Arrow-batched ``pandas_udf`` for DataFrame use;
- ``with_canonical_url`` — DataFrame helper adding ``url_canon`` +
  ``host`` columns (host extraction stays JVM-side via ``parse_url``).

Scale note: a vectorized fast-path regex skips already-canonical URLs
(the common case in a steady-state crawl), so the per-element Python in
``urlsplit`` only touches the messy minority of each Arrow batch.
"""

from __future__ import annotations

import re
from urllib.parse import quote, unquote, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRACKING_EXACT = frozenset(
    {"gclid", "fbclid", "msclkid", "yclid", "mc_cid", "mc_eid", "igshid", "_ga"}
)
TRACKING_PREFIX = "utm_"

# safe sets chosen so that quote(unquote(x)) is idempotent
_PATH_SAFE = "/:@!$&'()*+,;=~-._"
_QUERY_SAFE = ":@!$&'()*+,;=~-._/?"

_DEFAULT_PORT = {"http": "80", "https": "443"}

# fast-path: URL is certainly already canonical if it has a lowercase
# scheme+host, a non-empty path, and NO query/fragment/%-escape (a query
# might need param sorting, so any query routes to the slow path).
# Over-triggering the slow path is harmless — it is a no-op rewrite.
_CLEAN_RE = re.compile(r"^(?:http|https)://[a-z0-9](?:[a-z0-9.\-]*[a-z0-9])?/[^#%?\s]*$")
# a '.' or '..' path segment routes to the slow path for removal
_DOTSEG_RE = re.compile(r"/\.\.?(?:/|$)")


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments, verbatim."""
    inp, out = path, []
    while inp:
        if inp.startswith("../"):
            inp = inp[3:]
        elif inp.startswith("./"):
            inp = inp[2:]
        elif inp.startswith("/./"):
            inp = "/" + inp[3:]
        elif inp == "/.":
            inp = "/"
        elif inp.startswith("/../"):
            inp = "/" + inp[4:]
            if out:
                out.pop()
        elif inp == "/..":
            inp = "/"
            if out:
                out.pop()
        elif inp in (".", ".."):
            inp = ""
        else:
            i = inp.find("/", 1)
            if i == -1:
                out.append(inp)
                inp = ""
            else:
                out.append(inp[:i])
                inp = inp[i:]
    return "".join(out)


def _is_tracking(key: str) -> bool:
    return key.startswith(TRACKING_PREFIX) or key in TRACKING_EXACT


def canonicalize_one(raw: str) -> str:
    """Canonicalize a single URL string (the slow path)."""
    if raw is None:
        return None
    url = raw.strip()
    if not url:
        return ""
    if "://" not in url.split("?", 1)[0].split("#", 1)[0]:
        url = "http://" + url
    try:
        parts = urlsplit(url)
    except ValueError:
        return url  # unparseable: pass through untouched (never drop data)
    scheme = parts.scheme.lower()
    try:
        host = (parts.hostname or "").lower().rstrip(".")
        port = parts.port  # raises ValueError on junk like 'http://::'
    except ValueError:
        return url  # unparseable authority: pass through untouched
    if host and not host.isascii():
        # IDN hosts → punycode (RFC 3490 via the stdlib idna codec,
        # w3lib/safe_url_string behavior): 'münchen.example' and
        # 'xn--mnchen-3ya.example' are the SAME authority and must
        # collapse to one seen-set key. Unencodable labels (overlong,
        # empty) pass through — never drop data.
        try:
            host = host.encode("idna").decode("ascii")
        except UnicodeError:
            pass
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORT.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = _remove_dot_segments(quote(unquote(parts.path), safe=_PATH_SAFE)) or "/"
    query = ""
    if parts.query:
        kept = []
        for piece in parts.query.split("&"):
            if not piece:
                continue
            key = piece.split("=", 1)[0]
            if _is_tracking(unquote(key)):
                continue
            kept.append(quote(unquote(piece), safe=_QUERY_SAFE))
        kept.sort()
        query = "&".join(kept)
    return urlunsplit((scheme, netloc, path, query, ""))


def canonicalize_series(s: pd.Series) -> pd.Series:
    """Vectorized canonicalization of a pandas Series of URL strings."""
    s = s.astype("object")
    clean = s.str.match(_CLEAN_RE, na=False) & ~s.str.contains(_DOTSEG_RE, na=False)
    if clean.all():
        return s
    out = s.copy()
    dirty = ~clean & s.notna()
    out[dirty] = [canonicalize_one(u) for u in s[dirty]]
    return out


@F.pandas_udf(T.StringType())
def canonicalize_udf(s: pd.Series) -> pd.Series:  # pragma: no cover - thin wrapper
    return canonicalize_series(s)


def host_col(url: Column | str) -> Column:
    """Host of a URL, extracted JVM-side (no Python boundary)."""
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(F.parse_url(c, F.lit("HOST")))


def with_canonical_url(
    df: DataFrame, url_col: str = "url", out_col: str = "url_canon", host_out: str | None = "host"
) -> DataFrame:
    """Add ``url_canon`` (pandas UDF) and ``host`` (JVM ``parse_url``)."""
    df = df.withColumn(out_col, canonicalize_udf(F.col(url_col)))
    if host_out:
        df = df.withColumn(host_out, host_col(out_col))
    return df
