"""M0 — deterministic synthetic web fixture (SURVEY.md §7.1, FIXTURES.md B).

Generates the Common-Crawl-style ``pages`` table (url, warc_ts,
html:binary, text, lang — the exact schema from BASELINE.json's
input_hint), a pyjobs-style seed list, robots.txt fixtures, politeness
budgets, and the golden ``expected_offers`` oracle parquet.

Design mirrors the reference's world: 20 job-board hosts
(src0.example .. src19.example, one per reference source/spider), each
a chain of paginated list pages linking detail pages. src0/src1 are
"hot" (≈50% of all pages) to exercise skew salting. Some links are
deliberately messy (uppercase host, utm params, fragments, relative
hrefs) so the crawl must canonicalize; some detail pages live under
/private/ which robots disallows on even-numbered hosts.

Everything is seeded (seed=42 equivalent: content derives from md5 of
stable keys — no wall clock, no RNG state dependence), so any scale
regenerates bit-identically.
"""

from __future__ import annotations

import hashlib
import json
import sys
from datetime import datetime, timedelta, timezone
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_HOSTS = 20
JOBS_PER_LIST = 10
BASE_TS = datetime(2024, 1, 1, tzinfo=timezone.utc)

TITLES = [
    "D&eacute;veloppeur Python", "Data Engineer", "Ing&eacute;nieur DevOps",
    "Backend Developer", "Lead Python", "SRE", "Architecte Cloud",
    "D&eacute;veloppeur Full-Stack", "ML Engineer", "CTO adjoint",
]
COMPANIES = [
    "Soci&eacute;t&eacute; G&eacute;n&eacute;rique", "DataCorp", "La Forge &amp; Fils",
    "PyShop", "Cloudistes", "Les Scrapeurs R&eacute;unis", "Webable", "Octet &amp; Co",
]
LOCATIONS = [
    "Paris", "Lyon", "Toulouse", "Nantes", "  Bordeaux ", "Lille",
    "Grenoble", "Marseille", "T&eacute;l&eacute;travail",
]
SALARIES = ["35-45k&euro;", "40-50k", "45 000 &#39;brut&#39;", "N/A", "50-60k", "selon profil"]
WORDS = (
    "python spark crawl data web scrapy frontier pipeline offre mission "
    "&eacute;quipe agile cloud aws backend api rest docker kubernetes sql"
).split()
FR_MONTHS = [
    "janvier", "février", "mars", "avril", "mai", "juin", "juillet",
    "août", "septembre", "octobre", "novembre", "décembre",
]
LANGS = ["fr", "fr", "fr", "en", "es", "de", "zh"]  # fr-weighted


def h(key: str) -> int:
    """Stable 64-bit hash of a string key (no Python hash randomization)."""
    return int.from_bytes(hashlib.md5(key.encode()).digest()[:8], "big")


def host_of(i: int) -> str:
    return f"src{i}.example"


def warc_ts(url: str) -> datetime:
    return BASE_TS + timedelta(seconds=h("ts|" + url) % (365 * 86400))


def _pick(pool, key):
    return pool[h(key) % len(pool)]


def _date_str(family: int, key: str) -> str:
    day = 1 + h("d|" + key) % 28
    month = 1 + h("m|" + key) % 12
    year = 2023 + h("y|" + key) % 3
    if family in (0, 2):
        return f"{day} {FR_MONTHS[month - 1]} {year}"
    if family == 1:
        return f"{year:04d}-{month:02d}-{day:02d}"
    return f"{day:02d}/{month:02d}/{year:04d}"


# extra description words per page (0 = golden-fixture default). Heavy
# fixtures (~real Common-Crawl page weight) set this so per-page
# extraction CPU, not task latency, dominates the scaling bench.
_DESC_EXTRA = 0


def _description(key: str) -> str:
    n = 20 + h("dl|" + key) % 30
    toks = [WORDS[h(f"w|{key}|{i}") % len(WORDS)] for i in range(n)]
    # inject double spaces / newlines to exercise whitespace cleanup
    out = []
    for i, t in enumerate(toks):
        out.append(t)
        sep = h(f"s|{key}|{i}") % 10
        out.append("\n  " if sep == 0 else ("  " if sep == 1 else " "))
    if _DESC_EXTRA:
        # deterministic padding: tile the base tokens to target length
        # (extraction cost scales with text length, not entropy)
        reps = _DESC_EXTRA // max(len(toks), 1) + 1
        out.extend((" ".join(toks) + " ") * reps)
    return "".join(out).rstrip()


def detail_fields(source: str, job_id: int) -> dict:
    key = f"{source}|{job_id}"
    return {
        "title": f"{_pick(TITLES, 't|' + key)} #{job_id}",
        "company": _pick(COMPANIES, "c|" + key),
        "location": _pick(LOCATIONS, "l|" + key),
        "salary": _pick(SALARIES, "s|" + key),
        "date": None,  # filled by caller with family
        "description": _description(key),
    }


def detail_html(source: str, family: int, job_id: int, robots_meta: str = "") -> str:
    f = detail_fields(source, job_id)
    date_s = _date_str(family, f"{source}|{job_id}")
    if family == 0:
        body = (
            '<div class="job-offer">\n'
            f'  <h1 class="title"> {f["title"]} </h1>\n'
            f'  <div class="company">{f["company"]}</div>\n'
            f'  <div class="location">{f["location"]}</div>\n'
            f'  <div class="salary">{f["salary"]}</div>\n'
            f'  <div class="pubdate">{date_s}</div>\n'
            f'  <div class="description">{f["description"]}</div>\n'
            "</div>"
        )
    elif family == 1:
        body = (
            '<table class="offer">\n'
            f'<tr><td id="t">{f["title"]}</td></tr>\n'
            f'<tr><td id="c"> {f["company"]}</td></tr>\n'
            f'<tr><td id="l">{f["location"]}</td></tr>\n'
            f'<tr><td id="s">{f["salary"]}</td></tr>\n'
            f'<tr><td id="d">{date_s}</td></tr>\n'
            f'<tr><td id="desc">{f["description"]}</td></tr>\n'
            "</table>"
        )
    elif family == 2:
        body = (
            '<div class="posting">'
            f'<span data-field="title">{f["title"]}</span>'
            f'<span data-field="company">{f["company"]}</span>'
            f'<span data-field="location"> {f["location"]}</span>'
            f'<span data-field="salary">{f["salary"]}</span>'
            f'<span data-field="pubdate">{date_s}</span>'
            f'<span data-field="description">{f["description"]}</span>'
            "</div>"
        )
    else:
        body = (
            f'<h2>{f["title"]}</h2>\n'
            f'<p class="meta">{f["company"]} — {f["location"]} — {f["salary"]}</p>\n'
            f'<p class="date">{date_s}</p>\n'
            f'<p class="desc">{f["description"]}</p>'
        )
    related = job_id + 1
    rel_link = f'<a class="related" href="/job/{related:06d}">voir aussi</a>'
    meta = f'<meta name="robots" content="{robots_meta}">' if robots_meta else ""
    return (
        f"<html><head>{meta}<title>{f['title']}</title></head><body>\n{body}\n{rel_link}\n</body></html>"
    )


def messy_detail_href(host: str, job_id: int, private: bool) -> str:
    """Deterministically messy link form; canonicalizes to the detail URL."""
    path = f"/private/job/{job_id:06d}" if private else f"/job/{job_id:06d}"
    v = h(f"mess|{host}|{job_id}") % 5
    if v == 0:
        return path  # root-relative
    if v == 1:
        return f"https://{host.upper()}{path}"
    if v == 2:
        return f"https://{host}{path}?utm_source=board&utm_campaign=x"
    if v == 3:
        return f"https://{host}{path}#apply"
    return f"https://{host}{path}"


def alias_href(j: int, kind: int) -> str:
    """Legacy short-link path that 301s toward the real detail URL."""
    return f"/go2/{j:06d}" if kind == 1 else f"/go/{j:06d}"


def list_html(host: str, source: str, family: int, page: int, job_ids: list[int], n_pages: int, private_set: set[int], alias_map: dict[int, int] | None = None, nofollow_set: set[int] | None = None) -> str:
    alias_map = alias_map or {}
    nofollow_set = nofollow_set or set()

    def href(j: int) -> str:
        if j in alias_map:
            return alias_href(j, alias_map[j])
        return messy_detail_href(host, j, j in private_set)

    def rel(j: int) -> str:
        return ' rel="nofollow"' if j in nofollow_set else ""

    rows = "\n".join(
        f'<li><a class="job-link"{rel(j)} href="{href(j)}">'
        f"{detail_fields(source, j)['title']}</a></li>"
        for j in job_ids
    )
    # realistic board pagination: next, a doubling jump, and the last page
    # (numbered pagination) — lets a breadth-first crawler reach page P in
    # O(log P) waves instead of a fully serial next-next-next chain
    def page_url(p: int) -> str:
        return "/jobs" if p == 1 else f"/jobs?page={p}"

    nav = {p for p in (page + 1, min(2 * page, n_pages), n_pages) if 1 <= p <= n_pages and p != page}
    nxt = "\n".join(
        f'<a class="next" href="{page_url(p)}">page {p}</a>' for p in sorted(nav)
    )
    # occasional cross-host link the offsite filter must drop
    off = ""
    if h(f"off|{host}|{page}") % 3 == 0:
        other = host_of((int(source[3:]) + 7) % N_HOSTS)
        off = f'<a class="offsite" href="https://{other}/jobs">partner</a>'
    return (
        f"<html><head><title>{source} jobs p{page}</title></head><body>\n"
        f'<ul class="jobs">\n{rows}\n</ul>\n{nxt}\n{off}\n</body></html>'
    )


def page_text(html: str) -> str:
    """Ground-truth text column: naive tag-strip of the html."""
    import re as _re

    return _re.sub(r"\s+", " ", _re.sub(r"<[^>]+>", " ", html)).strip()


def host_quota(total_pages: int, i: int) -> int:
    if i in (0, 1):  # hot hosts: 25% each
        return total_pages // 4
    return (total_pages // 2) // (N_HOSTS - 2)


def generate(
    total_pages: int,
    out_dir: str | Path,
    desc_extra: int = 0,
    redirects: bool = False,
    charsets: bool = False,
    meta_robots: bool = False,
) -> dict:
    """Write pages/seeds/robots/politeness/expected_offers under out_dir.

    With ``meta_robots=True`` a deterministic slice of non-private
    detail pages carries ``<meta name="robots" content="noindex">``
    (crawled but yields no offer) or ``content="nofollow"`` (offer
    kept, related link not followed), and a slice of list anchors gains
    ``rel="nofollow"``. ``expected_offers`` still lists every detail
    page; tests compute reachability/indexability per the REP rules.

    With ``redirects=True`` the corpus gains a ``redirect_to`` column
    and a deterministic slice of non-private jobs is linked via legacy
    short paths that 301 to the real detail URL (``/go/…`` one hop,
    ``/go2/…`` two hops), plus one 2-cycle (``/loopA`` ⇄ ``/loopB``) on
    host 3 — those jobs are only reachable by following redirects.
    Expected offers are unchanged: extraction happens at the final URL.

    With ``charsets=True`` hosts stop being uniformly UTF-8: hosts with
    ``i % 5 == 2`` serve UTF-16 LE with a BOM, hosts with ``i % 5 == 4``
    serve ISO-8859-1 declared via an injected ``<meta charset>`` (pages
    whose text doesn't fit latin-1 stay plain UTF-8 with no meta tag).
    Ground-truth text and expected offers are computed from the exact
    str a correct decoder recovers.
    """
    global _DESC_EXTRA
    from tests.oracle.extract import extract_offer

    _DESC_EXTRA = desc_extra
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    redirect_tos: list[str | None] = []
    exp = []
    seeds = []
    robots_rows = []
    polite_rows = []
    host_enc = ""  # per-host encoding mode, set in the host loop

    def encode_html(html: str) -> tuple[bytes, str]:
        """(bytes as served, str a correct decoder recovers)."""
        if host_enc == "utf-16":
            return b"\xff\xfe" + html.encode("utf-16-le"), html
        if host_enc == "latin-1":
            tagged = html.replace(
                "<head>", '<head><meta charset="iso-8859-1">', 1
            )
            try:
                return tagged.encode("latin-1"), tagged
            except UnicodeEncodeError:
                return html.encode(), html
        return html.encode(), html

    def add_page(url: str, html: str, lang: str, redirect_to: str | None = None) -> str:
        raw, served = encode_html(html)
        urls.append(url)
        htmls.append(raw)
        texts.append(page_text(served))
        tss.append(warc_ts(url))
        langs.append(lang)
        redirect_tos.append(redirect_to)
        return served

    for i in range(N_HOSTS):
        host = host_of(i)
        source = f"src{i}"
        family = i % 4
        lang = LANGS[i % len(LANGS)]
        quota = host_quota(total_pages, i)
        # detail count D and list count P with D + P ≈ quota
        D = max(3, (quota * JOBS_PER_LIST) // (JOBS_PER_LIST + 1))
        P = (D + JOBS_PER_LIST - 1) // JOBS_PER_LIST
        private_set = {j for j in range(D) if h(f"priv|{host}|{j}") % 13 == 0}

        seeds.append({"source": source, "url": f"https://{host}/jobs", "allowed_host": host})
        rules = "User-agent: *\nDisallow: /private/\n" if i % 2 == 0 else "User-agent: *\nDisallow:\n"
        if i == 2:
            rules += "Crawl-delay: 2\n"
        robots_rows.append((host, rules, BASE_TS))
        polite_rows.append(
            (host, 2.0 if i == 2 else 0.5, 40 if i in (0, 1) else 200)
        )

        host_enc = (
            {2: "utf-16", 4: "latin-1"}.get(i % 5, "") if charsets else ""
        )
        alias_map: dict[int, int] = {}
        if redirects:
            for j in range(D):
                if j not in private_set:
                    a = h(f"redir|{host}|{j}") % 6
                    if a in (0, 1):
                        alias_map[j] = a
        meta_map: dict[int, str] = {}
        nofollow_set: set[int] = set()
        if meta_robots:
            for j in range(D):
                if j not in private_set:
                    k = h(f"meta|{host}|{j}") % 11
                    if k == 0:
                        meta_map[j] = "noindex"
                    elif k == 1:
                        meta_map[j] = "nofollow"
                if h(f"nf|{host}|{j}") % 7 == 0:
                    nofollow_set.add(j)

        for p in range(1, P + 1):
            job_ids = list(range((p - 1) * JOBS_PER_LIST, min(p * JOBS_PER_LIST, D)))
            url = f"https://{host}/jobs" if p == 1 else f"https://{host}/jobs?page={p}"
            html = list_html(host, source, family, p, job_ids, P, private_set, alias_map, nofollow_set)
            if redirects and i == 3 and p == 1:
                html = html.replace(
                    "</body>", '<a class="loop" href="/loopA">legacy</a>\n</body>'
                )
            add_page(url, html, lang)

        for j in range(D):
            path = f"/private/job/{j:06d}" if j in private_set else f"/job/{j:06d}"
            url = f"https://{host}{path}"
            html = detail_html(source, family, j, robots_meta=meta_map.get(j, ""))
            served = add_page(url, html, lang)
            exp.append(extract_offer(url, source, served))

        # 3xx alias pages: empty body, redirect_to carries the Location
        for j, a in sorted(alias_map.items()):
            real = f"https://{host}/job/{j:06d}"
            add_page(f"https://{host}{alias_href(j, 0)}", "", lang, redirect_to=real)
            if a == 1:
                add_page(
                    f"https://{host}{alias_href(j, 1)}",
                    "",
                    lang,
                    redirect_to=f"https://{host}{alias_href(j, 0)}",
                )
        if redirects and i == 3:
            add_page(f"https://{host}/loopA", "", lang, redirect_to=f"https://{host}/loopB")
            add_page(f"https://{host}/loopB", "", lang, redirect_to=f"https://{host}/loopA")

    cols = {
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us", tz="UTC")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    }
    if redirects:
        cols["redirect_to"] = pa.array(redirect_tos, pa.string())
    pages = pa.table(cols)
    # small row groups so the Spark scan splits (one 50 MB row group
    # would make the whole pages scan a single task at any core count)
    pq.write_table(pages, out / "pages.parquet", row_group_size=2048)

    (out / "seeds.json").write_text(json.dumps(seeds, indent=1))

    pq.write_table(
        pa.table(
            {
                "host": pa.array([r[0] for r in robots_rows]),
                "rules": pa.array([r[1] for r in robots_rows]),
                "fetched_ts": pa.array([r[2] for r in robots_rows], pa.timestamp("us", tz="UTC")),
            }
        ),
        out / "robots.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "host": pa.array([r[0] for r in polite_rows]),
                "delay_s": pa.array([r[1] for r in polite_rows], pa.float64()),
                "max_per_wave": pa.array([r[2] for r in polite_rows], pa.int32()),
            }
        ),
        out / "politeness.parquet",
    )

    exp_tbl = pa.table(
        {
            "url": pa.array([e["url"] for e in exp]),
            "source": pa.array([e["source"] for e in exp]),
            "title": pa.array([e["title"] for e in exp]),
            "company": pa.array([e["company"] for e in exp]),
            "location": pa.array([e["location"] for e in exp]),
            "salary": pa.array([e["salary"] for e in exp]),
            "description": pa.array([e["description"] for e in exp]),
            "publication_ts": pa.array([e["publication_ts"] for e in exp], pa.timestamp("us", tz="UTC")),
            "extracted_text": pa.array([e["extracted_text"] for e in exp]),
        }
    )
    pq.write_table(exp_tbl, out / "expected_offers.parquet")
    return {"pages": pages.num_rows, "offers": exp_tbl.num_rows, "out": str(out)}


FIXTURE_VERSION = "v4"  # bump when generator/oracle output changes


def ensure_fixture(
    total_pages: int,
    base: str | Path | None = None,
    desc_extra: int = 0,
    redirects: bool = False,
    charsets: bool = False,
    meta_robots: bool = False,
) -> Path:
    """Generate-once cache keyed by (scale, page weight); returns the dir.

    ``base`` defaults to ``$SPARK_GRAFT_DATA_DIR`` or ``<repo>/_data`` —
    the env override keeps data out of the zip dir when the engine ships
    via ``spark-submit --py-files``. ``desc_extra`` pads descriptions
    toward real-web page weight (heavy scaling bench).
    """
    import os

    if base is None:
        base = os.environ.get("SPARK_GRAFT_DATA_DIR", REPO / "_data")
    name = (
        f"web{total_pages}"
        + (f"w{desc_extra}" if desc_extra else "")
        + ("r" if redirects else "")
        + ("c" if charsets else "")
        + ("m" if meta_robots else "")
    )
    out = Path(base) / name
    marker = out / "_COMPLETE"
    if not (marker.exists() and marker.read_text() == FIXTURE_VERSION):
        generate(
            total_pages, out, desc_extra=desc_extra, redirects=redirects,
            charsets=charsets, meta_robots=meta_robots,
        )
        marker.write_text(FIXTURE_VERSION)
    return out


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    dest = sys.argv[2] if len(sys.argv) > 2 else str(REPO / "_data" / f"web{n}")
    print(json.dumps(generate(n, dest)))
