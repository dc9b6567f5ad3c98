"""Multimodal column plumbing (north-star [EXT]): image/audio/video as
opaque ``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` stages.

The container has no image/audio libraries, so the DECODE step is stubbed:
``decode_image`` raises ``NotImplementedError`` unless PIL is importable,
and the default feature extractor is a deterministic fake (byte stats +
md5). Everything Spark-side — schema, partitioning, UDF signature, Arrow
batch shape — is real and tested; a real decoder drops in behind the same
signature.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id bigint, media_type string, content binary, "
                "meta_width int, meta_height int, source string")

FEATURE_SCHEMA = ("media_id bigint, media_type string, n_bytes int, "
                  "checksum string, feat_mean double, feat_dim int")

try:  # real decoder only if an imaging lib exists (not in this container)
    import PIL.Image  # noqa: F401
    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def media_from_documents(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the documents fixture: the
    text bytes stand in for an encoded image payload."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
            (F.col("doc_id") % 3 + 1).cast("int")).alias("media_type"),
        F.encode("text", "UTF-8").alias("content"),
        F.pmod(F.col("n_chars"), F.lit(1024)).cast("int").alias("meta_width"),
        F.pmod(F.col("doc_id"), F.lit(768)).cast("int").alias("meta_height"),
        "source",
    )


def decode_image(content: bytes):
    """Real decode path: PIL where installed; otherwise the stdlib
    png_mini decoder for 8-bit gray/RGB PNG payloads (round-11 — the
    real-decode branch now EXECUTES in PIL-less containers instead of
    skipping; tests/test_multimodal_real.py pins it against exact pixel
    stats). Non-PNG payloads without PIL still raise
    NotImplementedError — plug a real decoder into
    extract_features(decode_fn=...)."""
    if not _HAS_PIL:
        from etl_transparencia_sergipe_spark.sources.png_mini import (
            _SIG, decode_png,
        )

        if content is not None and bytes(content[:8]) == _SIG:
            return decode_png(bytes(content))
        raise NotImplementedError(
            "non-PNG image decode requires PIL/pillow (not in this "
            "container); plug a real decoder into "
            "extract_features(decode_fn=...)")
    import io

    return PIL.Image.open(io.BytesIO(content))


def real_decode_features(content: bytes) -> tuple[float, int]:
    """Real decode + feature-extract (round-7 VERDICT item 7, PNG path
    de-stubbed round-11): mean grayscale pixel value and pixel count —
    the production drop-in for
    ``extract_features(decode_fn=real_decode_features)``. PNG payloads
    decode without pillow via the stdlib ``sources/png_mini.py`` codec
    (8-bit gray/RGB); PIL, when importable, handles everything else.
    Only NON-PNG payloads in a PIL-less container raise
    NotImplementedError. tests/test_multimodal_real.py pins the PNG
    branch with real bytes; the PIL branch keeps the importorskip."""
    import numpy as np

    img = decode_image(content)
    px = np.asarray(img.convert("L"), dtype=np.float64)
    return float(px.mean()), int(px.size)


def fake_decode_features(content: bytes) -> tuple[float, int]:
    """Deterministic stand-in for decode+feature-extract: mean byte value
    and a fake 'dimension' from the payload length."""
    if content is None or len(content) == 0:
        return 0.0, 0
    return sum(content) / len(content), min(len(content), 2048)


FRAME_SCHEMA = ("media_id bigint, frame_idx int, frame_offset int, "
                "frame_bytes int, frame_checksum string")


def sample_frames(media: DataFrame, n_frames: int = 4,
                  frame_size: int = 256) -> DataFrame:
    """Frame sampling as a row-EXPANDING mapInPandas stage (UDTF shape):
    each video payload yields up to ``n_frames`` evenly spaced byte
    windows standing in for decoded frames. Real decoders replace the
    slicing; the Spark plumbing (batch iterator in, multi-row frames out,
    stable schema) is the part that matters at scale."""
    import hashlib

    def run(batches):
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_offset": [],
                   "frame_bytes": [], "frame_checksum": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                blob = content or b""
                k = min(n_frames, max(1, len(blob) // frame_size))
                step = max(1, (len(blob) - frame_size) // max(1, k - 1)) \
                    if len(blob) > frame_size else 1
                for i in range(k):
                    off = min(i * step, max(0, len(blob) - frame_size))
                    frame = blob[off:off + frame_size]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_offset"].append(off)
                    out["frame_bytes"].append(len(frame))
                    out["frame_checksum"].append(
                        hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("media_type") == "video/mp4")
        .mapInPandas(run, schema=FRAME_SCHEMA)
    )


def extract_features(media: DataFrame, decode_fn=fake_decode_features,
                     batch_parallelism: int | None = None) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow moves the binary column to Python in columnar batches; the
    decode loop is per-row inside the batch (decoding is inherently
    per-payload) but amortizes interpreter overhead across the batch.
    """
    if batch_parallelism:
        media = media.repartition(batch_parallelism)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_fn(c) for c in pdf["content"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [len(c) if c is not None else 0
                            for c in pdf["content"]],
                "checksum": [hashlib.md5(c or b"").hexdigest()
                             for c in pdf["content"]],
                "feat_mean": [f[0] for f in feats],
                "feat_dim": [f[1] for f in feats],
            })

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# perceptual-hash near-dup over media content (round-4)
# ---------------------------------------------------------------------------

AHASH_SCHEMA = "media_id bigint, media_type string, ahash bigint"


def average_hash(media: DataFrame) -> DataFrame:
    """64-bit average-hash (aHash) per media payload via mapInPandas.

    Real pipeline: decode -> grayscale -> 8x8 downsample -> threshold at
    the mean -> 64 bits. Without an imaging lib the 'decode' is the same
    deterministic stand-in as ``fake_decode_features``: the payload's
    byte stream pooled into 64 buckets — identical payloads hash
    identically and small byte perturbations flip few bits, which is the
    property the near-dup join needs. A real decoder drops in by
    replacing the pooling input with pixel values; schema, batching, and
    the downstream Hamming join are unchanged.

    Bit i is set iff bucket i's byte sum exceeds the all-bucket average:
    ``64 * S_i > sum(S)`` — the mean-pool threshold expressed as an
    EXACT integer comparison, so the DuckDB oracle (q91) reproduces it
    bit-for-bit with no float summation-order risk (equal buckets all
    have the same width, so dividing by it cancels out of the
    inequality).
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for c in pdf["content"]:
                b = np.frombuffer(c or b"\x00", dtype=np.uint8
                                  ).astype(np.int64)
                k = 64
                if len(b) < k:
                    b = np.pad(b, (0, k - len(b)))
                trim = len(b) - (len(b) % k)
                sums = b[:trim].reshape(k, -1).sum(axis=1)
                bits = (k * sums) > sums.sum()
                u = int.from_bytes(np.packbits(bits).tobytes(), "big")
                hashes.append(u - (1 << 64) if u >= (1 << 63) else u)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "ahash": pd.Series(hashes, dtype="int64"),
            })

    return media.mapInPandas(run, schema=AHASH_SCHEMA)


def hamming_neardup_pairs(hashes: DataFrame, max_dist: int = 4) -> DataFrame:
    """All media pairs with Hamming(ahash) <= max_dist, via pigeonhole
    band blocking: split the 64-bit hash into (max_dist + 1) bands — two
    hashes within distance d MUST agree on at least one band — and
    self-join on (band_idx, band_value). The first-matching-band
    predicate (the q32/q33 pattern) emits each pair from exactly one
    band, so no pair-distinct shuffle; bit_count(xor) verifies the exact
    distance in codegen. Shuffle ∝ n_media x (d+1) fixed-width rows —
    content bytes never shuffle.
    """
    nb = max_dist + 1
    width = 64 // nb

    def band(col: str, i: int) -> str:
        if i == nb - 1:  # last band takes the remainder bits
            return f"shiftright({col}, {i * width})"
        mask = (1 << width) - 1
        return f"shiftright({col}, {i * width}) & {mask}"

    b = hashes.selectExpr(
        "media_id", "media_type", "ahash",
        "explode(array(" + ", ".join(
            f"struct({i} AS band_i, {band('ahash', i)} AS band_v)"
            for i in range(nb)) + ")) AS s"
    ).select("media_id", "media_type", "ahash", "s.band_i", "s.band_v")
    x, y = b.alias("x"), b.alias("y")
    first_band = F.expr(" AND ".join(
        f"(x.band_i <= {j} OR ({band('x.ahash', j)}) != ({band('y.ahash', j)}))"
        for j in range(nb - 1)))
    return (
        # same-type pairs only: comparing an audio byte-stream hash to an
        # image hash is meaningless, and the per-type report must not
        # attribute cross-type pairs to id_a's type
        x.join(y, (F.col("x.media_type") == F.col("y.media_type"))
               & (F.col("x.band_i") == F.col("y.band_i"))
               & (F.col("x.band_v") == F.col("y.band_v"))
               & (F.col("x.media_id") < F.col("y.media_id"))
               & first_band)
        .select(F.col("x.media_id").alias("id_a"),
                F.col("y.media_id").alias("id_b"),
                F.col("x.media_type").alias("media_type"),
                F.expr("bit_count(x.ahash ^ y.ahash)").cast("int")
                .alias("dist"))
        .filter(F.col("dist") <= max_dist)
    )
