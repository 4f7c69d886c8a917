"""Driver query for the multimodal binary plumbing: documents text
encoded to a binary payload column, metadata extracted through the
Arrow-batched mapInPandas kernel (stub decode — the fake-dims
arithmetic is reproducible in SQL, so this pandas-UDF path gets a
full value oracle, unusual but deliberate: it proves the binary
batch plumbing end-to-end)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import decode_image_metadata
from ..sources.catalog import load_table


def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    meta = decode_image_metadata(
        docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    )
    hashes = docs.select("doc_id", F.md5("text").alias("content_md5"))
    return meta.join(hashes, "doc_id")


ORACLE_MULTIMODAL_METADATA = """
SELECT doc_id,
       octet_length(CAST(text AS BLOB)) AS byte_len,
       'FAKE' AS format,
       CAST(64 + octet_length(CAST(text AS BLOB)) % 257 AS INT) AS width,
       CAST(64 + (octet_length(CAST(text AS BLOB)) * 31) % 257 AS INT) AS height,
       md5(text) AS content_md5
FROM documents
"""


def audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Framed energy profile over binary payloads (audio
    feature-extract plumbing; ASCII text bytes stand in for PCM)."""
    from ..operators.multimodal import audio_frame_energy as op

    docs = load_table(spark, sf_dir, "documents")
    return op(docs.select("doc_id", F.encode("text", "UTF-8").alias("payload")), frame_bytes=256)


ORACLE_AUDIO_FRAME_ENERGY = """
WITH d AS (
  SELECT doc_id, text, octet_length(CAST(text AS BLOB)) AS blen FROM documents
), fr AS (
  SELECT doc_id, j,
         list_sum(list_transform(range(j * 256 + 1, least((j + 1) * 256, blen) + 1),
                  i -> ord(substr(text, CAST(i AS INT), 1)))) AS energy
  FROM d, LATERAL (SELECT unnest(range(0, CAST(ceil(blen / 256.0) AS BIGINT))) AS j)
  WHERE blen > 0
), ranked AS (
  SELECT doc_id, j, energy,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY energy DESC, j ASC) AS rn
  FROM fr
)
SELECT d.doc_id,
       CAST(ceil(blen / 256.0) AS BIGINT) AS n_frames,
       CAST(COALESCE(s.total_energy, 0) AS BIGINT) AS total_energy,
       CAST(COALESCE(p.energy, 0) AS BIGINT) AS peak_energy,
       COALESCE(p.j, -1) AS peak_frame
FROM d
LEFT JOIN (SELECT doc_id, SUM(energy) AS total_energy FROM fr GROUP BY doc_id) s USING (doc_id)
LEFT JOIN (SELECT doc_id, j, energy FROM ranked WHERE rn = 1) p USING (doc_id)
"""


def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-4th-frame sampling over binary payloads (video keyframe
    plumbing; 512-byte frames, md5 identity per frame)."""
    from ..operators.multimodal import sample_video_frames

    docs = load_table(spark, sf_dir, "documents")
    return sample_video_frames(
        docs.select("doc_id", F.encode("text", "UTF-8").alias("payload")),
        frame_bytes=512,
        every_n=4,
    )


ORACLE_VIDEO_FRAME_SAMPLE = """
WITH d AS (
  SELECT doc_id, text, octet_length(CAST(text AS BLOB)) AS blen FROM documents
)
SELECT doc_id, j AS frame_idx,
       least((j + 1) * 512, blen) - j * 512 AS frame_len,
       md5(substr(text, CAST(j * 512 + 1 AS INT), 512)) AS frame_md5
FROM d, LATERAL (SELECT unnest(range(0, CAST(ceil(blen / 512.0) AS BIGINT), 4)) AS j)
WHERE blen > 0
"""


def image_resize_pixelsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end proof of the REAL image resize (decode → NN resample
    → re-encode, functions/png.py): synthesize a deterministic
    gradient PNG per document (dims and pixels derived from doc_id by
    integer math), push it through ``resize_images`` (fit within
    24×24), then decode the EMITTED bytes and report the actual
    dimensions and pixel sum. Every output value is reproduced by the
    SQL oracle from doc_id alone — so a wrong filter, resample
    mapping, or encoder bug flips the value hash.

    Scale shape: three Arrow-batched mapInPandas stages, zero
    shuffles, zero collects — pure per-partition pipeline, linear in
    corpus size."""
    import numpy as np
    import pandas as pd

    from ..operators.multimodal import resize_images

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def make(batches):
        from ..functions import png as P

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 16 + did % 49, 16 + (did * 7) % 49
                img = (
                    (np.arange(w)[None, :] * 3 + np.arange(h)[:, None] * 5 + did) % 256
                ).astype(np.uint8)
                rows.append((did, P.encode_png(img)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payloads = docs.mapInPandas(make, "doc_id long, payload binary")
    resized = resize_images(payloads, max_w=24, max_h=24).select("doc_id", "resized")

    def measure(batches):
        from ..functions import png as P

        for pdf in batches:
            rows = []
            for did, b in zip(pdf["doc_id"], pdf["resized"]):
                img = P.decode_png(bytes(b))
                rows.append(
                    (int(did), img.shape[1], img.shape[0], int(img.sum(dtype=np.int64)))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "out_width", "out_height", "pixel_sum"]
            )

    return resized.mapInPandas(
        measure, "doc_id long, out_width int, out_height int, pixel_sum long"
    ).orderBy("doc_id")


# fit_dims with max 24×24: width-limited iff w*24 >= h*24 iff w >= h;
# NN sample at (y, x) reads source pixel ((y*h)//nh, (x*w)//nw).
ORACLE_IMAGE_RESIZE_PIXELSUM = """
WITH d AS (
  SELECT doc_id, 16 + doc_id % 49 AS w, 16 + (doc_id * 7) % 49 AS h FROM documents
), dims AS (
  SELECT doc_id, w, h,
         CASE WHEN w <= 24 AND h <= 24 THEN w
              WHEN w >= h THEN 24
              ELSE GREATEST(1, (w * 24) // h) END AS nw,
         CASE WHEN w <= 24 AND h <= 24 THEN h
              WHEN w >= h THEN GREATEST(1, (h * 24) // w)
              ELSE 24 END AS nh
  FROM d
)
SELECT doc_id,
       CAST(nw AS INT) AS out_width,
       CAST(nh AS INT) AS out_height,
       CAST(SUM((((x * w) // nw) * 3 + ((y * h) // nh) * 5 + doc_id) % 256) AS BIGINT)
         AS pixel_sum
FROM dims,
     LATERAL (SELECT unnest(range(0, nh)) AS y),
     LATERAL (SELECT unnest(range(0, nw)) AS x)
GROUP BY doc_id, nw, nh
ORDER BY doc_id
"""


QUERIES = {
    "multimodal_metadata": multimodal_metadata,
    "audio_frame_energy": audio_frame_energy,
    "video_frame_sample": video_frame_sample,
    "image_resize_pixelsum": image_resize_pixelsum,
}
ORACLES = {
    "multimodal_metadata": ORACLE_MULTIMODAL_METADATA,
    "audio_frame_energy": ORACLE_AUDIO_FRAME_ENERGY,
    "video_frame_sample": ORACLE_VIDEO_FRAME_SAMPLE,
    "image_resize_pixelsum": ORACLE_IMAGE_RESIZE_PIXELSUM,
}
