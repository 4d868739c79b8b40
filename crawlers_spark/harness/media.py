"""Multimodal plumbing under the DuckDB oracle.

The media table derives deterministically from ``documents`` (content =
utf-8 bytes of the text, SURVEY-§1.2 ``html:binary`` shape), so the
oracle can recompute the mapInPandas stages' outputs in pure SQL:
digest = md5 of the bytes, fake header fields are digest nibbles —
see ``operators/multimodal.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlers_spark.harness.common import load
from crawlers_spark.operators.multimodal import (
    decode_media,
    embed_media,
    resize_images,
    sample_frames,
    synth_media,
)

_NIB = "strpos('0123456789abcdef', substr(md5(text), {i}, 1)) - 1"

_SQL_DECODED = f"""
  SELECT doc_id AS media_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         md5(text) AS digest,
         CAST(64 + ({_NIB.format(i=1)}) * 16 AS INT) AS width,
         CAST(64 + ({_NIB.format(i=2)}) * 16 AS INT) AS height,
         CASE WHEN doc_id % 3 = 0 THEN 0.0
              ELSE CAST(1 + ({_NIB.format(i=3)}) AS DOUBLE) END AS duration_s
  FROM documents
"""


def q_decode(spark, sf):
    return decode_media(synth_media(load(spark, sf, "documents")))


SQL_DECODE = f"SELECT * FROM ({_SQL_DECODED})"


def q_resize(spark, sf):
    return resize_images(decode_media(synth_media(load(spark, sf, "documents"))), max_side=128)


SQL_RESIZE = f"""
SELECT media_id, width, height,
       CAST(floor(width * scale) AS INT) AS new_width,
       CAST(floor(height * scale) AS INT) AS new_height
FROM (
  SELECT media_id, width, height,
         CASE WHEN greatest(width, height) > 128
              THEN 128 / CAST(greatest(width, height) AS DOUBLE)
              ELSE 1.0 END AS scale
  FROM ({_SQL_DECODED}) WHERE kind = 'image')
"""


def q_frames(spark, sf):
    return sample_frames(decode_media(synth_media(load(spark, sf, "documents"))), fps=1.0)


SQL_FRAMES = f"""
SELECT media_id, duration_s,
       unnest(list_transform(range(0, CAST(floor(duration_s * 1.0) AS BIGINT)),
                             i -> CAST(i AS DOUBLE) / 1.0)) AS frame_ts
FROM ({_SQL_DECODED}) WHERE kind = 'video'
"""


def q_embed(spark, sf):
    emb = embed_media(synth_media(load(spark, sf, "documents")), dims=8)
    return emb.select(
        "media_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )


SQL_EMBED = """
SELECT media_id,
       list_transform(range(0, 8), j -> CAST(CAST(
         (strpos('0123456789abcdef', substr(md5(text), CAST(2*j+1 AS INT), 1)) - 1) * 16.0
          + (strpos('0123456789abcdef', substr(md5(text), CAST(2*j+2 AS INT), 1)) - 1)
         AS DOUBLE) / 255.0 - 0.5 AS FLOAT) :: DOUBLE) AS embedding
FROM (SELECT doc_id AS media_id, text FROM documents)
"""


QUERIES = {
    "multi_decode_media": (q_decode, SQL_DECODE),
    "multi_resize_plan": (q_resize, SQL_RESIZE),
    "multi_frame_sample": (q_frames, SQL_FRAMES),
    "multi_embed_media": (q_embed, SQL_EMBED),
}
