"""Full RFC 3986 relative-reference resolution for outlinks.

The fused outlink pass (extraction/extractors.py) resolves
ROOT-relative hrefs (``/a/b``) scan-side — the only form the synthetic
fixture emits, pinned by byte parity. Real pages also carry
path-relative (``x/y``), dot-segment (``../up``), protocol-relative
(``//host/z``), query-only (``?q=1``) and fragment-only references,
plus an optional ``<base href>`` that re-bases ALL of them (and may
itself be relative, resolving against the page URL first — RFC 3986
§5.1.1). Scrapy gets this from ``response.urljoin``/w3lib; here it is
a composable operator over extracted link rows:

    links = extract_outlinks(fetched)            # raw hrefs
    resolved = resolve_outlinks(links, pages)    # RFC 3986 absolute

- :func:`base_href` — the page's declared base (JVM regexp, either
  quote style/attr position, first declaration wins).
- :func:`urljoin_udf` — Arrow-batched stdlib ``urljoin`` (the
  reference implementation of §5.3 merge semantics; a per-row loop
  inside the Arrow batch, same budget class as canonicalize_one's
  slow path — string-merge logic does not vectorize).
- :func:`resolve_refs` — effective base = urljoin(page url,
  base href or ''), then urljoin(effective base, ref).

Scale shape: pure scan — no exchange is introduced; the html column
is consulted only for the (tiny) base-href extract and never shuffles.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BASE_D = r"""(?i)<base\b[^>]*\bhref\s*=\s*"([^"]*)\""""
_BASE_S = r"""(?i)<base\b[^>]*\bhref\s*=\s*'([^']*)'"""
_BASE_U = r"""(?i)<base\b[^>]*\bhref\s*=\s*([^"'\s>]+)"""


def base_href(html: Column) -> Column:
    """The declared ``<base href>`` or NULL; first declaration wins
    (browsers honor only the first base element)."""
    out = None
    for pat in (_BASE_D, _BASE_S, _BASE_U):
        hit = F.regexp_extract(html, pat, 1)
        out = F.when(hit != "", hit) if out is None else out.when(hit != "", hit)
    return out


@F.pandas_udf(T.StringType())
def urljoin_udf(base: pd.Series, ref: pd.Series) -> pd.Series:
    from urllib.parse import urljoin

    return pd.Series(
        [
            urljoin(b, r) if b is not None and r is not None else None
            for b, r in zip(base, ref)
        ],
        dtype="object",
    )


def resolve_refs(
    df: DataFrame,
    *,
    url_col: str = "url",
    ref_col: str = "out_url",
    base_col: str | None = None,
    out_col: str = "resolved_url",
) -> DataFrame:
    """Absolute URL per reference row. ``base_col`` (the page's
    ``<base href>``, possibly NULL/relative) re-bases when present:
    effective base = urljoin(page url, base href) — RFC 3986 §5.1."""
    eff = F.col(url_col)
    if base_col is not None:
        eff = F.when(
            F.col(base_col).isNotNull(),
            urljoin_udf(F.col(url_col), F.col(base_col)),
        ).otherwise(F.col(url_col))
    return df.withColumn(out_col, urljoin_udf(eff, F.col(ref_col)))
