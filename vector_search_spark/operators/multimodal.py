"""Multimodal column operators (north-star, BASELINE.json): treat
image/audio/video as opaque ``binary`` columns with typed metadata structs;
decode/feature-extract runs as Arrow-batched ``mapInPandas``.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so the
decode step is STUBBED: ``decode_image_features`` uses a deterministic fake
(documented below) unless the real libs import; the Spark-side plumbing —
schema, binary transport through Arrow, batch iteration, partitioning — is
real and tested.  Frame/segment *sampling* is pure metadata math and stays
fully native (no UDF).

Scale notes: binary payloads ride the scan only (never shuffled here);
``mapInPandas`` streams record batches, so executor memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` × mean payload size —
size that down for 100 KB+ images.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # real decoder path (absent here)
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

FEATURE_DIM = 16
# pHash feature width (bytes == emitted bits).  Wider than FEATURE_DIM on
# purpose — see decode_image_phash: band collision mass at scale is the
# constraint, not feature richness.
PHASH_FEATURE_BYTES = 32

_FEATURES_SCHEMA = (
    "doc_id long, mime string, n_bytes int, width int, height int, "
    f"features array<double>"
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize a deterministic binary payload + metadata struct from text
    (fixture stand-in for real image bytes): payload = utf-8 bytes, metadata
    = (mime, n_bytes, fake width/height derived from a content hash)."""
    payload = F.encode(F.col(text_col), "utf-8")
    h = F.conv(F.substring(F.md5(F.col(text_col)), 1, 6), 16, 10).cast("long")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
            (h % 1920 + 1).cast("int").alias("width"),
            (F.shiftright(h, 11) % 1080 + 1).cast("int").alias("height"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic fake 'decode': dims + features from the byte content.

    STUB for the real ``PIL.Image.open → resize → embed`` path; raises in
    ``strict`` mode so callers can't mistake it for real pixels.
    """
    digest = hashlib.md5(payload).digest()
    w = digest[0] * 8 + 1
    h = digest[1] * 8 + 1
    feats = [(b / 255.0) * 2.0 - 1.0 for b in digest[:FEATURE_DIM]]
    return w, h, feats


def decode_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    meta_col: str = "meta",
    id_col: str = "doc_id",
    strict: bool = False,
) -> DataFrame:
    """Decode + feature-extract over binary payloads via ``mapInPandas``.

    ``strict=True`` demands the real decoder (PIL) and raises
    NotImplementedError per payload otherwise — the contract production
    code compiles against; the fake path keeps plumbing testable here.
    """
    use_real = HAVE_PIL

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if use_real:  # pragma: no cover - PIL absent in container
                raise NotImplementedError("real PIL decode not wired yet")
            if strict:
                raise NotImplementedError(
                    "image decode requires PIL; container has no codecs"
                )
            # The only per-row Python is the md5 itself (the "codec");
            # everything downstream is one vectorized numpy pass over the
            # packed digest matrix — the profiled round-6 hot spot was the
            # 16-element float comprehension per row, not the hashing.
            dig = np.frombuffer(
                b"".join(hashlib.md5(bytes(p)).digest() for p in pdf[payload_col]),
                dtype=np.uint8,
            ).reshape(-1, 16)
            feats = dig[:, :FEATURE_DIM].astype(np.float64) / 255.0 * 2.0 - 1.0
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    # mime/n_bytes were flattened JVM-side: plain column
                    # pass-through, no per-row struct-dict access.
                    "mime": pdf["__mime"],
                    "n_bytes": pdf["__n_bytes"],
                    "width": dig[:, 0].astype(np.int32) * 8 + 1,
                    "height": dig[:, 1].astype(np.int32) * 8 + 1,
                    "features": list(feats),
                },
                columns=["doc_id", "mime", "n_bytes", "width", "height", "features"],
            )

    from ..partitioning import fan_out

    # Flatten the metadata struct BEFORE the Arrow seam: struct columns
    # arrive in pandas as per-row dicts (Python-object access per row);
    # flat string/int columns are zero-copy Arrow arrays.
    flat = df.select(
        F.col(id_col),
        F.col(payload_col),
        F.col(f"{meta_col}.mime").alias("__mime"),
        F.col(f"{meta_col}.n_bytes").alias("__n_bytes"),
    )
    return fan_out(flat, id_col).mapInPandas(decode, schema=_FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame,
    duration_col: str = "duration_sec",
    fps_col: str = "fps",
    every_n: int = 30,
) -> DataFrame:
    """Video frame sampling as pure metadata math (NO decode): every
    ``every_n``-th frame index + its timestamp, exploded to one row per
    sampled frame.  Fully native (sequence/explode) — the decode of each
    sampled frame would then be a ``decode_image_features``-shaped pass."""
    n_frames = (F.col(duration_col) * F.col(fps_col)).cast("long")
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    out = df.withColumn("frame_index", F.explode(idx))
    return out.withColumn(
        "frame_ts_sec", (F.col("frame_index") / F.col(fps_col)).cast("double")
    )


def segment_audio(
    df: DataFrame,
    duration_col: str = "duration_sec",
    segment_sec: int = 30,
    overlap_sec: int = 5,
) -> DataFrame:
    """Audio chunking as metadata math: overlapping [start, end) segments
    via sequence/explode; the per-segment decode/transcribe stays a
    mapInPandas seam exactly like images."""
    step = segment_sec - overlap_sec
    starts = F.sequence(
        F.lit(0),
        F.greatest((F.col(duration_col) - 1).cast("long"), F.lit(0)),
        F.lit(step),
    )
    out = df.withColumn("seg_start_sec", F.explode(starts))
    return out.withColumn(
        "seg_end_sec",
        F.least(F.col("seg_start_sec") + segment_sec, F.col(duration_col).cast("long")),
    )


def decode_image_phash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Perceptual-hash leg of the decode seam: emit a 32-bit pHash per
    payload from the decoded feature bytes — bit i set iff 32·b_i > Σb
    (sign-vs-mean, the classic pHash reduction, stated in pure INTEGER
    arithmetic so the DuckDB twin is bit-exact).  32 bits (two md5
    digests as the stub's 32 feature bytes) since round 6: the r5 scaled
    run measured the original 16-bit/2×8-band config's random collision
    mass growing quadratically (24.7× at 10× data — the SRP lesson on the
    pHash family); 16-bit bands cut it 2^8× while pigeonhole completeness
    for hamming ≤ 1 is unchanged (2 bands > 1 differing bit).

    STUB decode like `decode_image_features` (md5 digests stand in for
    DCT coefficients of real pixels); the hash->band->hamming pipeline
    downstream is the real production shape.  Runs in the same Arrow-
    batched ``mapInPandas`` seam; payloads never shuffle."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            phashes = []
            for p in pdf[payload_col]:
                raw = bytes(p)
                d = (
                    hashlib.md5(raw).digest()
                    + hashlib.md5(b"ph2|" + raw).digest()
                )[:PHASH_FEATURE_BYTES]
                tot = sum(d)
                phashes.append(
                    sum(
                        (1 << i)
                        for i, b in enumerate(d)
                        if PHASH_FEATURE_BYTES * b > tot
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].to_numpy(), "phash": phashes},
                columns=["doc_id", "phash"],
            )

    from ..partitioning import fan_out

    return fan_out(df, id_col).mapInPandas(decode, schema="doc_id long, phash long")
