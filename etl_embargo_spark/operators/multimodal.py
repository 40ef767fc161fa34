"""Multimodal column plumbing (north-star extension).

Image/audio/video payloads are opaque ``binary`` columns plus typed metadata
(the same shape as the reference's tar-entry content, SURVEY D3).  The
Spark-side machinery here — schemas, partitioning, mapInPandas batch shape,
feature-array output — is real and tested; the actual codec step is STUBBED
(this container has no image/audio libraries) behind
``decoder_available()`` / a deterministic fake, clearly marked below.

Pipeline shape at 100 TB: media rows are grouped into size-bounded batches
(Arrow), decode/feature-extract runs vectorized per batch, output is a typed
feature struct — the same mapInPandas pattern as the tar exploder, which is
exactly how a real decode (PIL/ffmpeg/torchvision) plugs in: replace
``_fake_decode`` and keep every schema and partition decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_embargo_spark.catalog import load_table, spread_for_cpu

MEDIA_SCHEMA = (
    "media_id long, media_type string, content binary, "
    "declared_w int, declared_h int"
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, "
    "width int, height int, n_frames int, features array<float>"
)


def decoder_available() -> bool:
    """True when a real image codec is importable.  STUB GATE: in this
    container it is always False and the deterministic fake is used."""
    try:  # pragma: no cover - environment-dependent
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def synthetic_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a media table from ``documents``: the text bytes play the role
    of an encoded payload; type/declared dims are deterministic per doc."""
    docs = spread_for_cpu(load_table(spark, sf_dir, "documents"), spark)
    mtype = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mtype.alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("content"),
        ((F.col("doc_id") % 8 + 1) * 64).cast("int").alias("declared_w"),
        ((F.col("doc_id") % 4 + 1) * 64).cast("int").alias("declared_h"),
    )


def extract_features(
    media: DataFrame, n_features: int = 8, use_real_codec: bool | None = None
) -> DataFrame:
    """Decode + feature-extract via mapInPandas.

    REAL: batch iteration, schema contract, Arrow transfer, output shape.
    STUB: ``_fake_decode`` stands in for the codec — a deterministic
    byte-statistics 'decoder' so tests are reproducible.  A real decoder
    must keep the same (bytes → width, height, n_frames, features[])
    contract.

    ``use_real_codec`` defaults to ``decoder_available()``; the real path
    is NOT implemented in this container and raises loudly rather than
    silently emitting fake features where real ones were expected.
    """
    if use_real_codec is None:
        use_real_codec = decoder_available()
    if use_real_codec:
        raise NotImplementedError(
            "real codec path not implemented here: swap _fake_decode for a "
            "PIL/ffmpeg kernel keeping the same contract"
        )

    def _extract(batches):
        import numpy as _np
        import pandas as _pd

        def _fake_decode(content, media_type, declared_w, declared_h):
            # STUB decoder: deterministic statistics of the payload bytes.
            # Raise NotImplementedError here if a hard failure is preferred
            # over fake features when no codec is installed.
            arr = _np.frombuffer(bytes(content), dtype=_np.uint8)
            if arr.size == 0:
                arr = _np.zeros(1, dtype=_np.uint8)
            n_frames = 1 if media_type == "image" else int(arr.size % 30 + 1)
            feats = _np.array(
                [
                    arr.size,
                    float(arr.mean()),
                    float(arr.std()),
                    float(arr.min()),
                    float(arr.max()),
                    float(_np.median(arr)),
                    float((arr > 127).mean()),
                    float(arr[:64].sum() % 997),
                ],
                dtype=_np.float32,
            )
            return int(declared_w), int(declared_h), n_frames, feats

        for pdf in batches:
            rows = {
                "media_id": [], "media_type": [], "n_bytes": [],
                "width": [], "height": [], "n_frames": [], "features": [],
            }
            for _, r in pdf.iterrows():
                w, h, nf, feats = _fake_decode(
                    r["content"], r["media_type"], r["declared_w"], r["declared_h"]
                )
                rows["media_id"].append(r["media_id"])
                rows["media_type"].append(r["media_type"])
                rows["n_bytes"].append(len(bytes(r["content"])))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_frames"].append(nf)
                rows["features"].append(feats)
            yield _pd.DataFrame(rows)

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def resize_media(
    media: DataFrame, target_w: int, target_h: int
) -> DataFrame:
    """Resize plumbing: recompute dimension metadata and hand each payload
    to the (stubbed) resampling kernel via mapInPandas.

    REAL: schema/batch contract, aspect-ratio arithmetic (fit-within,
    never upscale), Arrow transfer.  STUB: the pixel resample itself —
    payload bytes pass through unchanged; a real implementation swaps the
    kernel body for PIL/ffmpeg and keeps the contract.
    """

    def _resize(batches):
        import pandas as _pd

        for pdf in batches:
            scale_w = pdf["declared_w"].clip(upper=target_w) / pdf["declared_w"]
            scale_h = pdf["declared_h"].clip(upper=target_h) / pdf["declared_h"]
            scale = scale_w.combine(scale_h, min)
            out = _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    # STUB: real kernel resamples; plumbing passes through
                    "content": pdf["content"],
                    "declared_w": (pdf["declared_w"] * scale).astype("int32"),
                    "declared_h": (pdf["declared_h"] * scale).astype("int32"),
                }
            )
            yield out

    return media.mapInPandas(_resize, schema=MEDIA_SCHEMA)


def frame_sample(features: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame-sampling plumbing for video rows: emit one row per sampled
    frame index — pure built-ins (sequence + explode), no Python."""
    video = features.filter(F.col("media_type") == "video")
    return video.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only driver query: synthetic media → feature extraction →
    per-type rollup of byte/frame counts (the plumbing end-to-end)."""
    media = synthetic_media(spark, sf_dir)
    feats = extract_features(media)
    return feats.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum("n_frames").alias("total_frames"),
    )


FRAME_EVERY_N = 5


def q_media_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only driver query for the full multimodal chain: synthesize →
    resize (fit-within 128×128) → decode/feature-extract → sample every
    5th frame of the video rows → per-media accounting (frames sampled,
    highest index).  Every stage is the Arrow-batched plumbing the real
    codecs plug into; pytest pins the sampled-frame arithmetic
    (tests/test_extensions.py)."""
    media = synthetic_media(spark, sf_dir)
    resized = resize_media(media, target_w=128, target_h=128)
    feats = extract_features(resized)
    sampled = frame_sample(feats, every_n=FRAME_EVERY_N)
    return sampled.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.max("frame_idx").alias("max_frame_idx"),
    )


MEDIA_THUMB_BYTES = 64  # leading payload slice standing in for a pHash


def q_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media deduplication by payload-signature hash: duplicate groups
    per media type, each with its copy count and smallest-id
    representative — the first (and at real corpus scale, the
    highest-yield) pass of any image/audio dedup pipeline.  The
    signature here is the md5 of the leading MEDIA_THUMB_BYTES of the
    payload — the deterministic stand-in for a perceptual hash (the
    synthetic corpus has no full-payload duplicates; a real pipeline
    swaps this one projection for pHash/chromaprint and keeps the
    group-by mechanics unchanged, exactly like the codec stub above).

    Scale shape: only the 16-byte signature and ids cross the wire (the
    payload column is pruned after the hash projection — at 100 TB the
    shuffle carries ~32 B/row regardless of media size); the group-by
    is map-side combined.  The hash runs JVM-side over the binary
    column."""
    media = synthetic_media(spark, sf_dir)
    return (
        media.select(
            "media_type",
            "media_id",
            F.md5(
                F.substring(F.col("content"), 1, MEDIA_THUMB_BYTES)
            ).alias("content_md5"),
        )
        .groupBy("media_type", "content_md5")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
            F.min("media_id").alias("rep_media_id"),
        )
        .filter(F.col("n_copies") >= 2)
    )


# ---------------------------------------------------------------------------
# Media storage profile
# ---------------------------------------------------------------------------

SIZE_BANDS = (256, 512, 1024, 2048)  # payload-size band edges, bytes


def q_media_storage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-planning profile of the media corpus: per (media type,
    payload-size band) the object count, total bytes, and largest
    payload — the capacity/layout readout (row-group sizing, blob
    externalization threshold) a multimodal lakehouse keeps per
    modality.

    Scale shape: byte length is a scan-side projection (no decode, no
    Python); one map-side-combined rollup to the |types|×|bands|
    relation.  Banding is fixed CASE thresholds — exact integers,
    portable everywhere."""
    media = synthetic_media(spark, sf_dir)
    nb = F.length(F.col("content"))
    band = (
        F.when(nb < SIZE_BANDS[0], F.lit(f"<{SIZE_BANDS[0]}"))
        .when(nb < SIZE_BANDS[1], F.lit(f"<{SIZE_BANDS[1]}"))
        .when(nb < SIZE_BANDS[2], F.lit(f"<{SIZE_BANDS[2]}"))
        .when(nb < SIZE_BANDS[3], F.lit(f"<{SIZE_BANDS[3]}"))
        .otherwise(F.lit(f">={SIZE_BANDS[3]}"))
    )
    return media.select(
        "media_type", band.alias("size_band"), nb.alias("nb")
    ).groupBy("media_type", "size_band").agg(
        F.count(F.lit(1)).alias("n_objects"),
        F.sum("nb").alias("total_bytes"),
        F.max("nb").alias("max_bytes"),
    )
