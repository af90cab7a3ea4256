"""Multimodal column plumbing: image/audio/video as opaque BINARY with
typed metadata.

The container has no codec libraries, so the *decode kernels* are
stubbed (clearly-marked NotImplementedError or a deterministic fake),
but the Spark-side plumbing is real and tested: schemas, Arrow batch
shape, mapInPandas iteration, partition sizing. On a real cluster you
drop `pillow`/`soundfile` into the marked slots and nothing else
changes — this mirrors how the reference isolates its NPU calls behind
a uniform tensor->tensor interface
(/root/reference/src/detection/text_detector.cpp:241-271).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),      # image|audio|video
    T.StructField("payload", T.BinaryType(), True),    # opaque bytes
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
])

FEATURE_SCHEMA = ("media_id string, kind string, n_bytes long, "
                  "feature array<float>, decode_status string")

FEATURE_DIM = 16


def _decode_image(payload: bytes):
    """REAL-DECODER SLOT: `from PIL import Image; Image.open(...)`.
    Not available in this container."""
    raise NotImplementedError("image decode requires pillow (not in sandbox)")


def _fake_feature(payload: bytes) -> np.ndarray:
    """Deterministic fake feature: 16 floats derived from the sha256 of
    the payload — a stand-in with the exact shape/dtype a real encoder
    would produce, so downstream joins/ANN code paths are exercised."""
    h = hashlib.sha256(payload or b"").digest()
    arr = np.frombuffer(h[:FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    return arr / 65535.0


def featurize_media(df: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """mapInPandas featurizer: (media rows) -> (media_id, feature...).

    Batch shape note: payloads are large — callers rely on the session's
    Arrow record cap (see session.build_session) exactly like the html
    path. The iterator form lets one task stream many small Arrow
    batches without materializing the partition.
    """
    def run(batches):
        for pdf in batches:
            feats, status = [], []
            for payload in pdf["payload"]:
                if use_real_decoder:
                    try:
                        _decode_image(payload)
                        # REAL-ENCODER SLOT: replace the fake with the
                        # model feature of the decoded image
                        feats.append(_fake_feature(payload).tolist())
                        status.append("decoded")
                    except NotImplementedError:
                        feats.append(_fake_feature(payload).tolist())
                        status.append("stub-fallback")
                    continue
                feats.append(_fake_feature(payload).tolist())
                status.append("stubbed")
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                "feature": feats,
                "decode_status": status,
            })

    cols = ["media_id", "kind", "payload"]
    return df.select(*cols).mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explodes (media_id, duration_ms)
    into per-frame rows with target timestamps — the real frame grab is
    the stubbed kernel; the explode/partition shape is the real thing."""
    from pyspark.sql import functions as F
    n = (F.coalesce(F.col("duration_ms"), F.lit(0)) / every_ms).cast("int")
    return (df.filter(F.col("kind") == "video")
            .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)))))
            .select("media_id",
                    "frame_idx",
                    (F.col("frame_idx") * every_ms).alias("frame_ts_ms")))


RESIZE_SCHEMA = ("media_id string, payload binary, out_width int, "
                 "out_height int, resize_status string")


def resize_media(df: DataFrame, max_side: int = 224) -> DataFrame:
    """Image resize operator (the reference's pad/resize preprocessing
    analog, /root/reference/src/preprocessing/image_ops.cpp:31-58:
    cap the max side, preserve aspect). The pixel kernel is the stubbed
    slot; the output-geometry arithmetic, schema, and mapInPandas batch
    shape are real and tested.

    Aspect-preserving target dims from metadata:
      scale = max_side / max(w, h) (never upscale), floored like the
      reference floors to multiples (here: floor to int).
    """
    def run(batches):
        for pdf in batches:
            n = len(pdf)
            w = pdf["width"].fillna(0).astype("int64").to_numpy()
            h = pdf["height"].fillna(0).astype("int64").to_numpy()
            m = np.maximum(w, h)
            scale = np.where(m > max_side, max_side / np.maximum(m, 1), 1.0)
            # round, don't truncate: 277 * (224/277) = 223.999... must
            # come out 224 — the long side of a downscale IS max_side
            out_w = np.maximum(np.rint(w * scale).astype("int64"), 1)
            out_h = np.maximum(np.rint(h * scale).astype("int64"), 1)
            # REAL-RESIZE SLOT: PIL Image.resize((out_w, out_h)); the
            # stub passes payload bytes through unchanged, flagged
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": pdf["payload"],
                "out_width": out_w.astype("int32"),
                "out_height": out_h.astype("int32"),
                "resize_status": ["stub-passthrough"] * n,
            })

    return (df.select("media_id", "payload", "width", "height")
            .mapInPandas(run, schema=RESIZE_SCHEMA))
