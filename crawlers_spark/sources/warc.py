"""WARC source: read Common-Crawl-style WARC files into the ``pages``
shape (url, warc_ts, html:binary).

The engine's corpus tables are parquet/Iceberg; real Common Crawl ships
WARC (ISO 28500) — this connector closes that gap with a pure-stdlib
record parser (no warcio in the sandbox; the format is simple framing:
``WARC/1.0`` + CRLF headers + Content-Length-delimited block). Files
arrive through Spark's ``binaryFile`` source and records are split
inside ``mapInPandas`` — one task per WARC file (Common Crawl shards
its crawls into ~1 GB WARC files, so file-level parallelism is the
natural unit; a 100 TB crawl is ~100k files across executors).

Only ``response`` records are emitted. For records whose block is an
HTTP response, the HTTP header section is stripped so ``html`` is the
payload alone (matching what the reference's downloader hands to the
spider); raw non-HTTP blocks pass through whole.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WARC_PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, warc_file string"


def iter_warc_records(data: bytes):
    """Yield (headers: dict, block: bytes) for each record (stdlib-only).

    Framing per ISO 28500: version line, CRLF header lines up to a blank
    line, ``Content-Length`` octets of block, then CRLF CRLF.
    """
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record CRLFs
        while data.startswith(b"\r\n", pos):
            pos += 2
        if pos >= n:
            break
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        head = data[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            break  # not a record boundary — stop rather than mis-frame
        headers = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", "0"))
        block_start = head_end + 4
        yield headers, data[block_start : block_start + length]
        pos = block_start + length


def _strip_http_headers(block: bytes) -> bytes:
    if block.startswith(b"HTTP/"):
        sep = block.find(b"\r\n\r\n")
        if sep >= 0:
            return block[sep + 4 :]
    return block


def read_warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """WARC file(s) → DataFrame in the ``pages`` shape.

    ``path`` accepts globs (``dir/*.warc``). Timestamps are the
    records' ``WARC-Date`` (UTC ISO-8601 per spec).
    """
    raw = spark.read.format("binaryFile").load(path)

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import gzip

        for pdf in it:
            for _, row in pdf.iterrows():
                data = bytes(row["content"])
                if data[:2] == b"\x1f\x8b":
                    # Common Crawl ships .warc.gz with one gzip member
                    # per record; gzip.decompress handles concatenated
                    # members transparently
                    data = gzip.decompress(data)
                urls, tss, htmls = [], [], []
                for headers, block in iter_warc_records(data):
                    if headers.get("warc-type") != "response":
                        continue
                    urls.append(headers.get("warc-target-uri", ""))
                    tss.append(headers.get("warc-date"))
                    htmls.append(_strip_http_headers(block))
                if urls:
                    yield pd.DataFrame(
                        {
                            "url": urls,
                            "warc_ts": pd.to_datetime(tss, utc=True).tz_localize(None),
                            "html": htmls,
                            "warc_file": row["path"],
                        }
                    )

    return raw.select("path", "content").mapInPandas(parse, WARC_PAGES_SCHEMA)


def warc_record_bytes(url: str, iso_ts: str, payload: bytes) -> bytes:
    """One ISO 28500 ``response`` record, deterministic bytes.

    The record id is content-derived (md5 of url|ts) instead of a
    random uuid so re-running the writer over the same rows produces
    byte-identical shards — the same idempotence contract as the offer
    sink (O14). No HTTP framing is added: the reader's
    ``_strip_http_headers`` passes raw blocks through whole, so the
    round trip is exact.
    """
    import hashlib

    rid = hashlib.md5(f"{url}|{iso_ts}".encode()).hexdigest()
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {iso_ts}\r\n"
        f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def warc_revisit_bytes(
    url: str, iso_ts: str, digest: str, refers_url: str, refers_ts: str
) -> bytes:
    """One ISO 28500 ``revisit`` record (ISO 28500 §6.7.2 /
    netpreserve identical-payload-digest profile) — what Common Crawl
    and Heritrix write instead of re-storing a payload the crawl has
    already captured: an empty-block record carrying the payload
    digest and a pointer to the record that holds the bytes. Digest is
    the repo's md5 content digest (Common Crawl uses sha1/base32; the
    header is self-describing via the ``md5:`` prefix). Record id is
    content-derived like :func:`warc_record_bytes` — idempotent."""
    import hashlib

    rid = hashlib.md5(f"revisit|{url}|{iso_ts}".encode()).hexdigest()
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: revisit\r\n"
        "WARC-Profile: http://netpreserve.org/warc/1.0/revisit/identical-payload-digest\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {iso_ts}\r\n"
        f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
        f"WARC-Payload-Digest: md5:{digest}\r\n"
        f"WARC-Refers-To-Target-URI: {refers_url}\r\n"
        f"WARC-Refers-To-Date: {refers_ts}\r\n"
        "Content-Length: 0\r\n"
        "\r\n"
    ).encode()
    return head + b"\r\n\r\n"


def with_revisit_markers(df: DataFrame) -> DataFrame:
    """pages-shape rows + (_digest, _is_revisit, _refers_url,
    _refers_ts): per md5(html) payload digest, the earliest capture by
    (warc_ts, url) is the original; every other capture becomes a
    revisit pointing at it. One digest-keyed window (the html bytes
    ride the shuffle ONCE — at Common Crawl shard sizes prefer
    pre-partitioning the writer's input by digest so this exchange is
    the only one); deterministic total order ⇒ idempotent output."""
    from pyspark.sql import Window, functions as F

    d = df.withColumn("_digest", F.md5(F.col("html")))
    w = (
        Window.partitionBy("_digest")
        .orderBy("warc_ts", "url")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .withColumn("_refers_url", F.first("url").over(w))
        .withColumn("_refers_ts", F.first("warc_ts").over(w))
        .withColumn("_is_revisit", F.col("_rn") > 1)
        .drop("_rn")
    )


def write_warc_pages(
    df: DataFrame, out_dir: str, *, compress: bool = True, dedup_revisits: bool = False
) -> DataFrame:
    """pages-shape DataFrame → directory of ``part-NNNNN.warc[.gz]``
    shards (Common Crawl layout: one gzip member per record, so any
    range of records is independently decompressible and our reader —
    and warcio — consume it transparently).

    One shard per input partition, written executor-side (``out_dir``
    must be storage every executor can reach — the same contract as any
    Spark file sink). Returns the sink's LINEAGE DataFrame
    ``(warc_file, n_records, n_bytes)`` — one row per shard, lazily
    executed like every other sink in the engine, so callers commit it
    through the same staged-write path as ``wave_out`` when atomicity
    matters. Record ids are content-derived: re-running the writer over
    the same partitioning yields byte-identical shards (idempotent,
    O14's contract).

    Scale shape: the html bytes never shuffle — each shard streams out
    of its input partition; the returned lineage is shard-count-sized.
    Repartition upstream to size shards (Common Crawl targets ~1 GB).

    ``dedup_revisits=True`` switches on Common Crawl / Heritrix payload
    dedup: per md5(html) digest the earliest capture by (warc_ts, url)
    is stored as a full ``response`` record and every later identical
    capture becomes an empty-block ``revisit`` record pointing at it
    (:func:`warc_revisit_bytes`) — the archive stays complete (every
    fetch has a record) while duplicate payload bytes are stored once.
    This adds the ONE digest-keyed window shuffle of
    :func:`with_revisit_markers`; the read path is unchanged
    (``read_warc_pages`` emits ``response`` records only, so a
    deduped archive reads back as exactly the distinct payloads).
    """
    from typing import Iterator as _Iter

    from pyspark import TaskContext

    schema = "warc_file string, n_records bigint, n_bytes bigint"
    if dedup_revisits:
        df = with_revisit_markers(df)
        cols = ["url", "warc_ts", "html", "_digest", "_is_revisit", "_refers_url", "_refers_ts"]
    else:
        cols = ["url", "warc_ts", "html"]

    def emit(it: _Iter[pd.DataFrame]) -> _Iter[pd.DataFrame]:
        import gzip as _gzip
        import os

        pid = TaskContext.get().partitionId()
        chunks: list[bytes] = []
        n = 0
        for pdf in it:
            iso = pdf["warc_ts"].dt.strftime("%Y-%m-%dT%H:%M:%SZ")
            if dedup_revisits:
                riso = pdf["_refers_ts"].dt.strftime("%Y-%m-%dT%H:%M:%SZ")
                rows = zip(
                    pdf["url"], iso, pdf["html"],
                    pdf["_is_revisit"], pdf["_digest"], pdf["_refers_url"], riso,
                )
                for url, ts, html, isrev, dig, rurl, rts in rows:
                    rec = (
                        warc_revisit_bytes(url, ts, dig, rurl, rts)
                        if isrev
                        else warc_record_bytes(url, ts, bytes(html))
                    )
                    chunks.append(_gzip.compress(rec, 6, mtime=0) if compress else rec)
                    n += 1
            else:
                for url, ts, html in zip(pdf["url"], iso, pdf["html"]):
                    rec = warc_record_bytes(url, ts, bytes(html))
                    # mtime=0: gzip headers embed a timestamp by default,
                    # which would break the byte-identical idempotence
                    chunks.append(_gzip.compress(rec, 6, mtime=0) if compress else rec)
                    n += 1
        if not n:
            yield pd.DataFrame(
                {
                    "warc_file": pd.Series([], dtype="object"),
                    "n_records": pd.Series([], dtype="int64"),
                    "n_bytes": pd.Series([], dtype="int64"),
                }
            )
            return
        os.makedirs(out_dir, exist_ok=True)
        name = f"part-{pid:05d}.warc" + (".gz" if compress else "")
        path = os.path.join(out_dir, name)
        blob = b"".join(chunks)
        with open(path, "wb") as f:
            f.write(blob)
        yield pd.DataFrame(
            {"warc_file": [path], "n_records": [n], "n_bytes": [len(blob)]}
        )

    return df.select(*cols).mapInPandas(emit, schema)


# ----------------------------------------------------- WET (conversion)
def wet_record_bytes(url: str, iso_ts: str, text: str) -> bytes:
    """One WARC ``conversion`` record (the WET layout: Common Crawl's
    extracted-text sidecar files are WARC containers whose records are
    ``WARC-Type: conversion`` with a plain UTF-8 text payload). Record
    ids are content-derived like :func:`warc_record_bytes`, so the
    writer is byte-idempotent."""
    import hashlib

    payload = text.encode("utf-8")
    rid = hashlib.md5(f"wet|{url}|{iso_ts}".encode()).hexdigest()
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {iso_ts}\r\n"
        f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
        "Content-Type: text/plain\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def write_wet_pages(
    df: DataFrame, out_dir: str, *, text_col: str = "text", compress: bool = True
) -> DataFrame:
    """pages-shape DataFrame → ``part-NNNNN.warc.wet[.gz]`` shards —
    the WET third of the Common-Crawl container triad (WARC response
    shards: :func:`write_warc_pages`; CDX index: ``sources/cdx.py``).
    Same contract as the WARC sink: one gzip member per record, one
    shard per input partition streamed executor-side (text never
    shuffles), content-derived record ids (idempotent re-runs), and a
    lazily-executed lineage DataFrame ``(wet_file, n_records,
    n_bytes)`` for staged commits."""
    from typing import Iterator as _Iter

    from pyspark import TaskContext

    schema = "wet_file string, n_records bigint, n_bytes bigint"

    def emit(it: _Iter[pd.DataFrame]) -> _Iter[pd.DataFrame]:
        import gzip as _gzip
        import os

        pid = TaskContext.get().partitionId()
        chunks: list[bytes] = []
        n = 0
        for pdf in it:
            iso = pdf["warc_ts"].dt.strftime("%Y-%m-%dT%H:%M:%SZ")
            for url, ts, text in zip(pdf["url"], iso, pdf["_wet_text"]):
                rec = wet_record_bytes(url, ts, text if text is not None else "")
                chunks.append(_gzip.compress(rec, 6, mtime=0) if compress else rec)
                n += 1
        if not n:
            yield pd.DataFrame(
                {
                    "wet_file": pd.Series([], dtype="object"),
                    "n_records": pd.Series([], dtype="int64"),
                    "n_bytes": pd.Series([], dtype="int64"),
                }
            )
            return
        os.makedirs(out_dir, exist_ok=True)
        name = f"part-{pid:05d}.warc.wet" + (".gz" if compress else "")
        path = os.path.join(out_dir, name)
        blob = b"".join(chunks)
        with open(path, "wb") as f:
            f.write(blob)
        yield pd.DataFrame(
            {"wet_file": [path], "n_records": [n], "n_bytes": [len(blob)]}
        )

    from pyspark.sql import functions as F

    return df.select(
        "url", "warc_ts", F.col(text_col).alias("_wet_text")
    ).mapInPandas(emit, schema)


WET_PAGES_SCHEMA = "url string, warc_ts timestamp, text string, wet_file string"


def read_wet_pages(spark: SparkSession, path: str) -> DataFrame:
    """WET shards → (url, warc_ts, text, wet_file) — the reader half of
    the round trip; only ``conversion`` records are emitted (a mixed
    container's response records are the WARC reader's business).
    Same file-level parallelism as :func:`read_warc_pages`."""
    from typing import Iterator as _Iter

    files = spark.read.format("binaryFile").load(path)

    def parse(it: _Iter[pd.DataFrame]) -> _Iter[pd.DataFrame]:
        import gzip as _gzip

        for pdf in it:
            rows = []
            for fpath, data in zip(pdf["path"], pdf["content"]):
                raw = bytes(data)
                if fpath.endswith(".gz"):
                    raw = _gzip.decompress(raw)
                for headers, block in iter_warc_records(raw):
                    if headers.get("warc-type") != "conversion":
                        continue
                    rows.append(
                        (
                            headers.get("warc-target-uri", ""),
                            headers.get("warc-date", ""),
                            block.decode("utf-8", "replace"),
                            fpath,
                        )
                    )
            out = pd.DataFrame(rows, columns=["url", "warc_ts", "text", "wet_file"])
            if len(out):
                out["warc_ts"] = pd.to_datetime(
                    out["warc_ts"], format="%Y-%m-%dT%H:%M:%SZ"
                )
            else:
                out["warc_ts"] = pd.Series([], dtype="datetime64[ns]")
            yield out

    return files.mapInPandas(parse, WET_PAGES_SCHEMA)


# ------------------------------------------------------ WAT (metadata)
def wat_record_bytes(url: str, iso_ts: str, meta_json: str) -> bytes:
    """One WARC ``metadata`` record (the WAT layout: Common Crawl's
    metadata sidecars are WARC containers whose records carry a JSON
    envelope describing the corresponding response record). Content-
    derived record id → byte-idempotent writer."""
    import hashlib

    payload = meta_json.encode("utf-8")
    rid = hashlib.md5(f"wat|{url}|{iso_ts}".encode()).hexdigest()
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: metadata\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {iso_ts}\r\n"
        f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
        "Content-Type: application/json\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def write_wat_pages(
    df: DataFrame,
    out_dir: str,
    *,
    title_col: str = "title",
    links_col: str = "outlinks",
    compress: bool = True,
) -> DataFrame:
    """(url, warc_ts, title, outlinks:array<string>) → WAT shards —
    the metadata third of the Common-Crawl derivative family (WARC
    responses, WAT metadata, WET text; plus the CDX index in
    ``sources/cdx.py``). The JSON envelope is canonicalized
    deterministically (sorted keys, compact separators, sorted link
    list) so re-runs are byte-identical like the WARC/WET sinks.
    Same scale contract: one shard per partition, executor-side, a
    lazy lineage DataFrame ``(wat_file, n_records, n_bytes)`` back."""
    from typing import Iterator as _Iter

    from pyspark import TaskContext
    from pyspark.sql import functions as F

    schema = "wat_file string, n_records bigint, n_bytes bigint"

    def emit(it: _Iter[pd.DataFrame]) -> _Iter[pd.DataFrame]:
        import gzip as _gzip
        import json as _json
        import os

        pid = TaskContext.get().partitionId()
        chunks: list[bytes] = []
        n = 0
        for pdf in it:
            iso = pdf["warc_ts"].dt.strftime("%Y-%m-%dT%H:%M:%SZ")
            for url, ts, title, links in zip(
                pdf["url"], iso, pdf["_wat_title"], pdf["_wat_links"]
            ):
                envelope = {
                    "Envelope": {
                        "WARC-Header-Metadata": {
                            "WARC-Target-URI": url,
                            "WARC-Date": ts,
                        },
                        "Payload-Metadata": {
                            "HTML-Metadata": {
                                # Arrow hands array cells as numpy
                                # arrays: no truthiness, test None
                                "Head": {"Title": title if title is not None else ""},
                                "Links": sorted(
                                    [] if links is None else list(links)
                                ),
                            }
                        },
                    }
                }
                meta = _json.dumps(
                    envelope, sort_keys=True, separators=(",", ":")
                )
                rec = wat_record_bytes(url, ts, meta)
                chunks.append(_gzip.compress(rec, 6, mtime=0) if compress else rec)
                n += 1
        if not n:
            yield pd.DataFrame(
                {
                    "wat_file": pd.Series([], dtype="object"),
                    "n_records": pd.Series([], dtype="int64"),
                    "n_bytes": pd.Series([], dtype="int64"),
                }
            )
            return
        os.makedirs(out_dir, exist_ok=True)
        name = f"part-{pid:05d}.warc.wat" + (".gz" if compress else "")
        path = os.path.join(out_dir, name)
        blob = b"".join(chunks)
        with open(path, "wb") as f:
            f.write(blob)
        yield pd.DataFrame(
            {"wat_file": [path], "n_records": [n], "n_bytes": [len(blob)]}
        )

    return df.select(
        "url",
        "warc_ts",
        F.col(title_col).alias("_wat_title"),
        F.col(links_col).alias("_wat_links"),
    ).mapInPandas(emit, schema)


WAT_PAGES_SCHEMA = (
    "url string, warc_ts timestamp, title string, "
    "outlinks array<string>, wat_file string"
)


def read_wat_pages(spark: SparkSession, path: str) -> DataFrame:
    """WAT shards → (url, warc_ts, title, outlinks, wat_file); only
    ``metadata`` records with a parseable JSON envelope are emitted."""
    from typing import Iterator as _Iter

    files = spark.read.format("binaryFile").load(path)

    def parse(it: _Iter[pd.DataFrame]) -> _Iter[pd.DataFrame]:
        import gzip as _gzip
        import json as _json

        for pdf in it:
            rows = []
            for fpath, data in zip(pdf["path"], pdf["content"]):
                raw = bytes(data)
                if fpath.endswith(".gz"):
                    raw = _gzip.decompress(raw)
                for headers, block in iter_warc_records(raw):
                    if headers.get("warc-type") != "metadata":
                        continue
                    try:
                        env = _json.loads(block.decode("utf-8"))["Envelope"]
                        html = env["Payload-Metadata"]["HTML-Metadata"]
                    except (ValueError, KeyError):
                        continue
                    rows.append(
                        (
                            headers.get("warc-target-uri", ""),
                            headers.get("warc-date", ""),
                            html.get("Head", {}).get("Title", ""),
                            list(html.get("Links", [])),
                            fpath,
                        )
                    )
            out = pd.DataFrame(
                rows, columns=["url", "warc_ts", "title", "outlinks", "wat_file"]
            )
            if len(out):
                out["warc_ts"] = pd.to_datetime(
                    out["warc_ts"], format="%Y-%m-%dT%H:%M:%SZ"
                )
            else:
                out["warc_ts"] = pd.Series([], dtype="datetime64[ns]")
            yield out

    return files.mapInPandas(parse, WAT_PAGES_SCHEMA)
