"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the payload is an opaque ``binary``
column (or an object-store URI at real scale); metadata
(media_type/width/height/n_frames/duration) is typed columns so Catalyst can
prune/filter WITHOUT touching bytes; all byte-level work happens in
Arrow-batched ``mapInPandas`` with an executor-local decoder.

The image/audio codecs are NOT installed in this container, so the
library-backed decode is stubbed behind ``NotImplementedError``
(``LibraryDecoder``); the default ``ByteHistogramDecoder`` is a REAL,
deterministic feature extractor (normalized 16-bin byte histogram) so the
Spark-side plumbing — schema, partitioning, UDF signature, Arrow batch shape
— is fully exercised and tested.

Payload synthesis derives bytes from the documents text (utf-8), with
metadata derived from md5 hashes → deterministic and SQL-oracle-able.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_TYPES = ["image", "audio", "video"]


def synth_media(docs: DataFrame) -> DataFrame:
    """documents → media(doc_id, media_type, width, height, n_frames,
    payload binary). Metadata is md5-derived (deterministic, reproducible in
    any engine); payload is the utf-8 text bytes (a stand-in with realistic
    variable length)."""
    h = "CAST(conv(substr(md5(concat('m', doc_id)), 1, 8), 16, 10) AS BIGINT)"
    return docs.selectExpr(
        "doc_id",
        f"element_at(array({', '.join(repr(t) for t in MEDIA_TYPES)}), "
        f"CAST(doc_id % 3 AS INT) + 1) AS media_type",
        f"CAST(64 + {h} % 1024 AS INT) AS width",
        f"CAST(64 + ({h} DIV 1024) % 1024 AS INT) AS height",
        f"CAST(CASE WHEN doc_id % 3 = 2 THEN 1 + {h} % 300 ELSE 1 END AS INT) AS n_frames",
        "encode(text, 'UTF-8') AS payload",
    )


class ByteHistogramDecoder:
    """Deterministic stand-in decoder: 16-bin normalized byte histogram.
    Real computation over the binary payload — exercises the full
    binary-through-Arrow path without image libraries."""

    N_BINS = 16

    def features(self, payloads: pd.Series) -> np.ndarray:
        out = np.zeros((len(payloads), self.N_BINS), dtype=np.float64)
        for i, raw in enumerate(payloads):
            arr = np.frombuffer(bytes(raw), dtype=np.uint8)
            if arr.size:
                hist = np.bincount(arr >> 4, minlength=self.N_BINS).astype(
                    np.float64
                )
                out[i] = hist / hist.sum()
        return out


class LibraryDecoder:  # pragma: no cover - requires codecs not in sandbox
    """The real decode path (PIL/torchaudio/ffmpeg…), import-guarded: the
    Spark plumbing is identical — only this class swaps in."""

    def __init__(self):
        try:
            import PIL  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "image/audio codecs not installed in this container; "
                "use ByteHistogramDecoder"
            ) from e

    def features(self, payloads: pd.Series) -> np.ndarray:
        raise NotImplementedError


def extract_media_features(
    media: DataFrame, decoder_factory=ByteHistogramDecoder
) -> DataFrame:
    """mapInPandas: (metadata…, payload) → (doc_id, media_type, feature
    array<double>). Decoder is instantiated once per task (executor-local
    singleton pattern, as the reference loads its model once per process —
    ml_model.py:470-471)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decoder = decoder_factory()
        for pdf in batches:
            feats = decoder.features(pdf["payload"])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "feature": list(feats),
                }
            )

    return media.mapInPandas(
        process, schema="doc_id long, media_type string, feature array<double>"
    )


def sample_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame sampling plan for video rows — pure SQL over metadata (no byte
    touch): indices 0, every_n, 2·every_n, … < n_frames."""
    return media.filter(F.col("media_type") == "video").selectExpr(
        "doc_id",
        "n_frames",
        f"sequence(0, n_frames - 1, {every_n}) AS frame_indices",
        f"size(sequence(0, n_frames - 1, {every_n})) AS n_sampled",
    )


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize metadata transform (aspect-preserving clamp to max_side) —
    deterministic integer math, byte work deferred to the decode stage."""
    scale = F.expr(
        f"CAST({max_side} AS DOUBLE) / greatest(width, height)"
    )
    return media.select(
        "doc_id",
        "media_type",
        "width",
        "height",
        F.when(F.greatest("width", "height") <= max_side, F.col("width"))
        .otherwise(F.expr(f"CAST(floor(width * (CAST({max_side} AS DOUBLE) / greatest(width, height))) AS INT)"))
        .alias("new_width"),
        F.when(F.greatest("width", "height") <= max_side, F.col("height"))
        .otherwise(F.expr(f"CAST(floor(height * (CAST({max_side} AS DOUBLE) / greatest(width, height))) AS INT)"))
        .alias("new_height"),
    )
