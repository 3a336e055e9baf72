"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The container has no image/audio codecs, so DECODING is stubbed (clearly
marked); everything Spark-side is real and tested: schemas, Arrow batch
shape, partitioning, and the mapInArrow plumbing a decode stage needs at
100 TB (bytes-proportional batches, per-row error capture).

Two deterministic "fake decoders" stand in for the codec call so the
pipeline is end-to-end testable:
  * ``media_features``: fixed-length feature vector = seeded bytes histogram
    (16 buckets, L1-normalized) — the shape of an embedding extractor;
  * ``frame_sample``: offsets of K evenly spaced "frames" + their byte
    slices — the shape of a video frame sampler.

Swapping the fake for Pillow/ffmpeg later touches ONLY the marked function
bodies; the Spark plumbing (schema, batching, error rows) is unchanged.
"""

from __future__ import annotations

from typing import Iterable, Iterator, List

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, kind string, n_bytes int, features array<double>, error string"
)
FRAME_SCHEMA = (
    "media_id long, n_frames int, frame_offsets array<int>, frame_sizes array<int>, error string"
)

N_FEATURE_BUCKETS = 16


def _decode_and_featurize(payload: bytes) -> List[float]:
    """STUB DECODER — deterministic byte histogram in place of a real codec.

    Real implementation would be:
        img = PIL.Image.open(io.BytesIO(payload)); ...
    and raise NotImplementedError on unsupported codecs.  The fake keeps the
    exact signature + failure contract (raises on empty payload).
    """
    if not payload:
        raise ValueError("empty media payload")
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=N_FEATURE_BUCKETS).astype(np.float64)
    total = hist.sum()
    return (hist / total).tolist()


def _sample_frames(payload: bytes, k: int) -> tuple[List[int], List[int]]:
    """STUB FRAME SAMPLER — evenly spaced byte offsets in place of ffmpeg."""
    if not payload:
        raise ValueError("empty media payload")
    n = len(payload)
    step = max(1, n // k)
    offsets = list(range(0, n, step))[:k]
    sizes = [min(step, n - o) for o in offsets]
    return offsets, sizes


def media_features(media: DataFrame, kind_col: str = "kind") -> DataFrame:
    """media(media_id, kind, payload BINARY) -> feature rows.

    One mapInArrow stage; batches are bounded by Arrow maxRecordsPerBatch —
    size media partitions with plans.partitioning just like html pages.
    """

    def fn(batches: Iterable[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column("media_id").to_pylist()
            kinds = b.column(kind_col).to_pylist()
            payloads = b.column("payload").to_pylist()
            out_feat, out_nb, out_err = [], [], []
            for p in payloads:
                try:
                    out_feat.append(_decode_and_featurize(p or b""))
                    out_err.append(None)
                except Exception as exc:
                    out_feat.append(None)
                    out_err.append(f"{type(exc).__name__}: {exc}")
                out_nb.append(len(p or b""))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(kinds, pa.string()),
                    pa.array(out_nb, pa.int32()),
                    pa.array(out_feat, pa.list_(pa.float64())),
                    pa.array(out_err, pa.string()),
                ],
                names=["media_id", "kind", "n_bytes", "features", "error"],
            )

    return media.select("media_id", kind_col, "payload").mapInArrow(fn, MEDIA_SCHEMA)


def frame_sample(media: DataFrame, k: int = 8) -> DataFrame:
    """media(media_id, payload BINARY) -> frame offset/size rows."""

    def fn(batches: Iterable[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column("media_id").to_pylist()
            payloads = b.column("payload").to_pylist()
            offs, sizes, nf, errs = [], [], [], []
            for p in payloads:
                try:
                    o, s = _sample_frames(p or b"", k)
                    offs.append(o)
                    sizes.append(s)
                    nf.append(len(o))
                    errs.append(None)
                except Exception as exc:
                    offs.append(None)
                    sizes.append(None)
                    nf.append(0)
                    errs.append(f"{type(exc).__name__}: {exc}")
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(nf, pa.int32()),
                    pa.array(offs, pa.list_(pa.int32())),
                    pa.array(sizes, pa.list_(pa.int32())),
                    pa.array(errs, pa.string()),
                ],
                names=["media_id", "n_frames", "frame_offsets", "frame_sizes", "error"],
            )

    return media.select("media_id", "payload").mapInArrow(fn, FRAME_SCHEMA)
