"""Multimodal pipeline queries over the ``documents`` fixture —
binary payloads + typed metadata through the real ``mapInPandas``
decode/resize/frame-sample stages of
:mod:`mevi_spark.operators.multimodal`, each checked against a DuckDB
oracle that recomputes the byte-level math from the (ASCII) source text.

The oracles work because ``attach_media`` synthesizes the payload as
UTF-8 bytes of ``text`` (pure ASCII in the fixture → byte *k* ==
``ord(substr(text, k+1, 1))``), so DuckDB can replay the NumPy kernels
with character arithmetic while Spark runs the genuine binary path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mevi_spark.operators import multimodal as MM
from mevi_spark.plans.registry import register
from mevi_spark.sources.io import load_table


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return MM.attach_media(load_table(spark, sf_dir, "documents"))


# media_type is element_at 1-based over ('image','audio','video'):
# doc_id%3 = 0 → image, 1 → audio, 2 → video
_SQL_MEDIA = """
  SELECT doc_id,
         ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS media_type,
         text,
         strlen(text) AS n_bytes,
         (n_chars % 16 + 4)::INT AS width,
         (n_chars % 8 + 2)::INT AS height,
         (doc_id % 7 + 1)::INT AS n_frames
  FROM documents
"""

# one row per payload byte (ASCII ⇒ char k+1 is byte k)
_SQL_BYTES = """
  SELECT doc_id, ord(substr(text, i::INT, 1)) AS b
  FROM media, unnest(range(1, n_bytes + 1)) AS t(i)
"""


@register(
    "media_meta_stats",
    oracle=f"""
WITH media AS ({_SQL_MEDIA})
SELECT media_type,
       COUNT(*)::BIGINT AS n,
       SUM(n_bytes)::BIGINT AS total_bytes,
       CAST(ROUND(AVG(n_bytes) * 1000000) AS BIGINT) AS avg_bytes_e6,
       CAST(ROUND(AVG(width * height) * 1000000) AS BIGINT) AS avg_pixels_e6
FROM media GROUP BY media_type
""",
)
def media_meta_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only rollup — the column-pruning case: the plan must
    never read the payload column (binary stays on disk; verify with
    ``.explain`` → ReadSchema excludes ``payload``... here payload is
    computed, but on a real media Parquet this projection prunes it).

    Every output is pinned to BIGINT on both engines (averages as
    micro-units) — DuckDB's ``SUM``/``AVG`` otherwise emit
    HUGEINT/DOUBLE dtypes the driver's pandas value-hash can't match
    against Spark's LONG."""
    m = _media(spark, sf_dir)
    return m.groupBy("media_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.length("payload")).cast("long").alias("total_bytes"),
        F.round(F.avg(F.length("payload")) * 1e6)
        .cast("long")
        .alias("avg_bytes_e6"),
        F.round(F.avg(F.col("width") * F.col("height")) * 1e6)
        .cast("long")
        .alias("avg_pixels_e6"),
    )


@register(
    "media_decode_stats",
    oracle=f"""
WITH media AS ({_SQL_MEDIA}),
bytes AS ({_SQL_BYTES}),
hist AS (
  SELECT doc_id,
         COUNT(*)::BIGINT AS n_bytes,
         CAST(ROUND(AVG(b) * 1000000) AS BIGINT) AS mean_byte_e6,
         [SUM(CASE WHEN b // 32 = 0 THEN 1 ELSE 0 END)::BIGINT,
          SUM(CASE WHEN b // 32 = 1 THEN 1 ELSE 0 END)::BIGINT,
          SUM(CASE WHEN b // 32 = 2 THEN 1 ELSE 0 END)::BIGINT,
          SUM(CASE WHEN b // 32 = 3 THEN 1 ELSE 0 END)::BIGINT,
          SUM(CASE WHEN b // 32 = 4 THEN 1 ELSE 0 END)::BIGINT,
          SUM(CASE WHEN b // 32 = 5 THEN 1 ELSE 0 END)::BIGINT,
          SUM(CASE WHEN b // 32 = 6 THEN 1 ELSE 0 END)::BIGINT,
          SUM(CASE WHEN b // 32 >= 7 THEN 1 ELSE 0 END)::BIGINT] AS hist
  FROM bytes GROUP BY doc_id)
SELECT m.doc_id, m.media_type, h.n_bytes, h.mean_byte_e6,
       array_to_string(h.hist, ',') AS byte_hist
FROM media m JOIN hist h ON m.doc_id = h.doc_id
""",
)
def media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-stage features (mean byte + 8-bin byte histogram) computed
    by NumPy over Arrow batches; DuckDB replays them with character
    arithmetic. Output conformance (registry rules): the histogram is
    CSV-serialized (driver's canonicalizer cannot sort raw arrays) and
    the mean byte is a BIGINT in micro-units."""
    out = MM.decode_stats(_media(spark, sf_dir), hist_bins=8)
    # zero-byte payloads have no byte rows on the oracle side (its
    # unnest(range(1, 1)) is empty and the inner join drops the doc) —
    # stats are defined over decodable payloads on both engines
    out = out.filter(F.col("n_bytes") > 0)
    return out.select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.round(F.col("mean_byte") * 1e6).cast("long").alias("mean_byte_e6"),
        F.array_join(F.col("byte_hist").cast("array<string>"), ",").alias(
            "byte_hist"
        ),
    )


@register(
    "video_frame_sample",
    oracle=f"""
WITH media AS ({_SQL_MEDIA})
SELECT doc_id, k::INT AS frame_idx,
       (n_bytes // n_frames + CASE WHEN k < n_bytes % n_frames THEN 1 ELSE 0 END) AS frame_len
FROM media, unnest(range(0, n_frames, 2)) AS t(k)
WHERE media_type = 'video'
""",
)
def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (stride 2) over the video rows; the oracle checks
    the np.array_split chunk arithmetic (frame k gets
    ``L//n + (k < L%n)`` bytes)."""
    out = MM.sample_frames(_media(spark, sf_dir), stride=2)
    return out.select("doc_id", "frame_idx", "frame_len")


@register(
    "image_resize",
    oracle=f"""
WITH media AS ({_SQL_MEDIA}),
grid AS (
  SELECT doc_id, text, width, height, r, c,
         (r * height) // 6 AS sr, (c * width) // 8 AS sc
  FROM media,
       unnest(range(0, 6)) AS tr(r),
       unnest(range(0, 8)) AS tc(c)
  WHERE media_type = 'image'),
px AS (
  SELECT doc_id,
         CASE WHEN sr * width + sc < strlen(text)
              THEN ord(substr(text, (sr * width + sc + 1)::INT, 1))
              ELSE 0 END AS v
  FROM grid)
SELECT doc_id, 8::BIGINT AS out_w, 6::BIGINT AS out_h, 48::BIGINT AS out_len,
       SUM(v)::BIGINT AS checksum
FROM px GROUP BY doc_id
""",
)
def image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor resize of every image payload to 8×6 through the
    grayscale codec; the oracle replays the NumPy index arithmetic
    (src row = ``r*h//6``, src col = ``c*w//8``, zero-padded payload)
    and checks the resampled byte checksum. All outputs pinned BIGINT
    (DuckDB literals are INT32, SUM is HUGEINT — both break the
    driver's dtype-sensitive value hash)."""
    out = MM.resize_images(_media(spark, sf_dir), target_w=8, target_h=6)
    return out.select(
        "doc_id",
        F.col("out_w").cast("long").alias("out_w"),
        F.col("out_h").cast("long").alias("out_h"),
        F.col("out_len").cast("long").alias("out_len"),
        F.col("checksum").cast("long").alias("checksum"),
    )
