"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
pipelines.

The Spark-side contracts — schemas, UDF signatures, batch shapes,
partitioning — are real and tested; the codec step itself is STUBBED
(this environment has no image/audio libraries): ``decode_image`` parses a
deterministic fake header, and ``_real_decode`` raises NotImplementedError
until a codec library (PIL/librosa/av) is importable. Swapping in a real
codec changes only the inner function body — batching, schema, and
distribution are unchanged.

Why mapInPandas: binary payloads stay in Arrow record batches end-to-end
(no per-row Python), partition-parallel, and the UDF can emit a different
row count than it receives (frame sampling explodes 1 video row → N frame
rows).

Fake media format (deterministic, used by tests and the synthesizer):
``b"FAKEMEDI" + width(4, big-endian) + height(4) + channels(4) + payload``.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pb_etl_spark.operators._width import fanout_width

MAGIC = b"FAKEMEDI"
HEADER_LEN = len(MAGIC) + 12

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", T.StructType([
            T.StructField("source", T.StringType()),
            T.StructField("n_bytes", T.LongType()),
        ])),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_payload_bytes", T.LongType()),
    ]
)

FEATURE_DIM = 16
FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def encode_fake_media(width: int, height: int, channels: int, payload: bytes) -> bytes:
    """Build a fake-media blob (test/synthesizer helper)."""
    return (
        MAGIC
        + width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + channels.to_bytes(4, "big")
        + payload
    )


def _parse_header(content: bytes) -> tuple[int, int, int, int]:
    if content[: len(MAGIC)] != MAGIC:
        raise ValueError("not a fake-media blob")
    w = int.from_bytes(content[8:12], "big")
    h = int.from_bytes(content[12:16], "big")
    c = int.from_bytes(content[16:20], "big")
    return w, h, c, len(content) - HEADER_LEN


def _real_decode(content: bytes):  # pragma: no cover - stub by design
    """Real codec hook. STUB: no PIL/librosa/av in this environment."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real media decoding requires an image/audio library; "
            "only the deterministic fake-media format is supported here"
        ) from e
    raise NotImplementedError("wire PIL decode here when available")


def decode_media(df: DataFrame) -> DataFrame:
    """Decode header metadata from the binary column (Arrow-batched)."""

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                w, h, c, n = _parse_header(bytes(content))
                rows.append((mid, w, h, c, n))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "channels", "n_payload_bytes"]
            )

    return df.mapInPandas(fn, schema=DECODED_SCHEMA)


def extract_features(df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Deterministic fake feature extractor: payload bytes → fixed-dim
    float vector (byte-histogram folded to ``dim`` buckets, L1-normalized).
    A real model swaps the inner loop for batched inference; the Arrow
    plumbing and output schema stay identical."""

    def fn(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, feats = [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                payload = np.frombuffer(bytes(content)[HEADER_LEN:], dtype=np.uint8)
                hist = np.bincount(payload % dim, minlength=dim).astype("float32")
                total = hist.sum()
                feats.append((hist / total if total else hist).tolist())
                ids.append(mid)
            yield pd.DataFrame({"media_id": ids, "features": feats})

    return df.mapInPandas(fn, schema=FEATURES_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """1 video row → N frame rows: payload split into equal strides, one
    output row per sampled frame (demonstrates row-count-changing
    mapInPandas — the shape a real frame sampler has)."""

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                payload = bytes(content)[HEADER_LEN:]
                stride = max(1, len(payload) // n_frames)
                for i in range(n_frames):
                    chunk = payload[i * stride : (i + 1) * stride]
                    if not chunk:
                        break
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(chunk)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_bytes": frames}
            )

    return df.mapInPandas(fn, schema=FRAMES_SCHEMA)


def media_table_from_documents(spark, sf_dir: str) -> DataFrame:
    """Deterministic media table derived from ``documents``: the text
    payload is wrapped in a fake-media blob with header fields computed
    from doc_id (width = id%64+16, height = id%48+16, channels = id%3+1),
    kind cycling image/audio/video. Encoding runs distributed in
    mapInPandas — the testdata has no binary column, so this is the
    synthesizer for the multimodal path (blob format documented above)."""
    from pb_etl_spark.catalog import read_table

    # spread docs before the Python encode stage — a compact input file
    # would otherwise run all Arrow batches in one task
    docs = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(fanout_width(spark), "doc_id")
    )

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                payload = str(text).encode("utf-8")
                blob = encode_fake_media(
                    int(did) % 64 + 16, int(did) % 48 + 16, int(did) % 3 + 1, payload
                )
                rows.append((int(did), kinds[int(did) % 3], blob))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "content"])

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    return docs.mapInPandas(fn, schema=schema)


def q_media_decode(spark, sf_dir: str) -> DataFrame:
    """Round-trip through the binary path: encode documents into fake-media
    blobs, decode headers back with the Arrow mapInPandas decoder. The
    oracle predicts the decoded metadata directly from documents — so the
    whole binary encode→decode plumbing is value-checked, not rows-only."""
    media = media_table_from_documents(spark, sf_dir)
    return decode_media(media).select(
        "media_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("channels").cast("long").alias("channels"),
        "n_payload_bytes",
    )


def q_media_feature_agg(spark, sf_dir: str) -> DataFrame:
    """Feature-extraction plumbing over the binary column: byte-histogram
    features per item, aggregated per kind. UNREGISTERED (kept for tests):
    byte-level UTF-8 histogram averages aren't SQL-expressible, so this
    shape can only ever be a rows-only driver row — the registered,
    hash-checked face of the family is ``q_media_feature_summary``.
    Tests pin exact vectors for known payloads."""
    media = media_table_from_documents(spark, sf_dir)
    feats = extract_features(media)
    joined = media.select("media_id", "kind").join(feats, "media_id")
    return joined.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.avg(F.element_at("features", 1)), 6).alias("avg_f0"),
        F.round(F.avg(F.element_at("features", 2)), 6).alias("avg_f1"),
    )


def q_media_feature_summary(spark, sf_dir: str) -> DataFrame:
    """Hash-checked summary of the feature-extraction path: per kind,
    item count, total payload bytes, the feature dim the UDF actually
    emitted, and how many vectors are L1-normalized (sum≈1 — every
    non-empty payload, by construction). The full byte-histogram isn't
    SQL-expressible, but each of these IS predictable from ``documents``
    — so the Arrow encode→extract plumbing gets a real oracle instead
    of a rows-only row."""
    media = media_table_from_documents(spark, sf_dir)
    feats = extract_features(media)
    joined = media.select(
        "media_id", "kind", F.length("content").cast("long").alias("blob_bytes")
    ).join(feats, "media_id")
    feat_sum = F.aggregate(
        "features", F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    return joined.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("blob_bytes") - F.lit(HEADER_LEN)).alias("total_payload_bytes"),
        F.max(F.size("features")).cast("long").alias("feat_dim"),
        F.sum((F.round(feat_sum, 3) == 1.0).cast("long")).alias("n_unit_norm"),
    )


BIN_DOCS = 50  # docs materialized as standalone binary files


def binary_docs_path(spark, sf_dir: str) -> str:
    """The first BIN_DOCS documents materialized as one ``.bin`` file
    each (utf-8 text bytes, doc id in the filename) — the on-disk shape
    multimodal corpora actually arrive in (a directory of media blobs)
    before anyone parquet-packs them. Idempotent per sf_dir via a
    completion marker; the bounded 50-row driver collect is the same
    KB-sized materialization pattern as the layout fixtures."""
    import hashlib
    import os
    from pathlib import Path

    from pb_etl_spark.catalog import read_table

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = Path(__file__).resolve().parents[2] / "spark-warehouse" / "layout"
    path = root / f"bin_docs_{tag}"
    marker = path / "_SUCCESS"
    from pb_etl_spark.catalog import (
        derived_cache_needs_rebuild,
        record_derived_cache_src,
    )

    src = os.path.join(sf_dir, "documents.parquet")
    if derived_cache_needs_rebuild(marker, src):
        # full rebuild: a shrunken regenerated fixture must not leave
        # the old build's extra .bin files behind
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path, exist_ok=True)
        rows = (
            read_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < BIN_DOCS)
            .select("doc_id", "text")
            .collect()
        )
        for r in rows:
            with open(path / f"doc_{r['doc_id']:06d}.bin", "wb") as f:
                f.write(r["text"].encode("utf-8"))
        marker.touch()
        record_derived_cache_src(marker, src)
    return str(path)


def q_binaryfile_ingest(spark, sf_dir: str) -> DataFrame:
    """Binary-blob ingestion via Spark's ``binaryFile`` source — the
    entry point of every multimodal pipeline (a directory of media
    files becomes (path, length, content) rows; downstream decode is
    the mapInPandas path above). Emits per-doc byte length and content
    md5, with the doc id parsed from the filename. The oracle derives
    the identical rows from the documents table (UTF-8 byte length via
    octet_length of the encoded blob — encoding-aware, so non-ASCII
    text still matches; md5(content) = md5 of the same UTF-8 bytes),
    so a hash match proves the file materialization, the binaryFile
    scan, and the content bytes all round-trip exactly.

    EMPTY files are excluded on both legs: Spark's ``binaryFile``
    source emits NO row for a 0-byte file (FilePartition splits are
    size-based, so an empty file contributes no slice — verified
    empirically; found by the adversarial-fixture sweep's empty
    document). The oracle filters ``octet_length = 0`` to match. A
    production ingest that must SURFACE truncated/empty uploads pairs
    the scan with a file-listing anti-join — the binaryFile scan alone
    cannot see them."""
    path = binary_docs_path(spark, sf_dir)
    files = spark.read.format("binaryFile").load(path + "/*.bin")
    return files.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
    )


ORACLES: dict[str, str] = {
    "binaryfile_ingest": f"""
        SELECT doc_id,
               -- UTF-8 BYTE length: octet_length over encode(text), not a
               -- BLOB cast (DuckDB's VARCHAR->BLOB cast REJECTS
               -- non-ASCII bytes; encode() is the encoding-aware
               -- conversion) and not character count — matches Spark
               -- binaryFile's file length on any unicode text
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS content_md5
        FROM documents
        -- empty files excluded: Spark binaryFile emits no row for a
        -- 0-byte file (see q_binaryfile_ingest docstring)
        WHERE doc_id < {BIN_DOCS} AND octet_length(encode(text)) > 0
    """,
    "media_decode": """
        SELECT doc_id AS media_id,
               CAST(doc_id % 64 + 16 AS BIGINT) AS width,
               CAST(doc_id % 48 + 16 AS BIGINT) AS height,
               CAST(doc_id % 3 + 1 AS BIGINT) AS channels,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_payload_bytes
        FROM documents
    """,
    "media_feature_summary": """
        WITH d AS (
            SELECT doc_id,
                   CASE doc_id % 3 WHEN 0 THEN 'image'
                                   WHEN 1 THEN 'audio'
                                   ELSE 'video' END AS kind,
                   octet_length(encode(text)) AS payload_bytes
            FROM documents
        )
        SELECT kind, COUNT(*) AS n_items,
               CAST(SUM(payload_bytes) AS BIGINT) AS total_payload_bytes,
               CAST(16 AS BIGINT) AS feat_dim,
               CAST(SUM(CASE WHEN payload_bytes > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_unit_norm
        FROM d GROUP BY kind
    """,
}

def q_media_frame_sample(spark, sf_dir: str) -> DataFrame:
    """Row-count-changing frame sampling registered end-to-end: 1 media
    row → ≤4 frame rows via ``mapInPandas`` (the video-frame-extraction
    shape). ORACLE-CHECKED: the fake payload is the document's UTF-8
    text, and frames are compared by (byte length, md5 of the HEX
    rendering of the bytes). The hex indirection is what makes the
    digest byte-true cross-engine: the sampler strides over BYTES, a
    stride can split a multibyte UTF-8 character, and DuckDB can
    neither slice nor md5 BLOBs — but it CAN slice the hex string
    (2 chars per byte) and md5 that. The previous md5-of-raw-bytes
    digest only matched while every document was pure ASCII (found by
    the adversarial-fixture sweep, tools/adversarial_fixture.py);
    md5∘hex is injective in the bytes, so the check is exactly as
    strong."""
    media = media_table_from_documents(spark, sf_dir)
    frames = sample_frames(media)
    return frames.select(
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.length("frame_bytes").cast("long").alias("n_bytes"),
        F.md5(F.hex("frame_bytes")).alias("frame_md5"),
    )


ORACLES["media_frame_sample"] = """
    WITH d AS (
        -- hex(encode(text)) = 2 chars per UTF-8 BYTE, so byte slicing
        -- becomes hex slicing: byte [a, a+n) == hex [2a+1, 2n]
        SELECT doc_id AS media_id, hex(encode(text)) AS hx,
               octet_length(encode(text)) AS L
        FROM documents
    ), f AS (
        SELECT media_id, hx, L,
               GREATEST(1, L // 4) AS stride,
               unnest(generate_series(0, 3)) AS frame_idx
        FROM d
    )
    SELECT media_id, frame_idx,
           CAST(length(substring(hx, frame_idx * stride * 2 + 1, stride * 2))
                // 2 AS BIGINT) AS n_bytes,
           md5(substring(hx, frame_idx * stride * 2 + 1, stride * 2))
               AS frame_md5
    FROM f
    WHERE length(substring(hx, frame_idx * stride * 2 + 1, stride * 2)) > 0
"""

QUERIES = {
    "binaryfile_ingest": q_binaryfile_ingest,
    "media_decode": q_media_decode,
    "media_feature_summary": q_media_feature_summary,
    "media_frame_sample": q_media_frame_sample,
}


def media_stats(df: DataFrame) -> DataFrame:
    """Pure-JVM metadata aggregation over the binary column (no decode):
    bytes and counts per kind — the cheap pre-filter a 100 TB media
    pipeline runs before any codec work."""
    return df.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.length("content")).alias("total_bytes"),
        F.avg(F.length("content")).alias("avg_bytes"),
    )
