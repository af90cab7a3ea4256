"""Multimodal column plumbing: image/audio/video as opaque BINARY with
typed metadata.

The container has no codec libraries, so *compressed* decode kernels
(JPEG/PNG/MP4/FLAC) are stubbed (clearly-marked NotImplementedError),
but three container formats need no codec at all and their decoders
here are REAL: netpbm P5/P6 (raw PGM/PPM), uncompressed BI_RGB BMP
(24/32 bpp, bottom-up or top-down), and RIFF/WAVE PCM16. The
Spark-side plumbing is real and tested either way: schemas, Arrow
batch shape, mapInPandas iteration, partition sizing. On a real
cluster you drop `pillow`/`soundfile` into the marked slots for the
compressed formats and nothing else changes — this mirrors how the
reference isolates its NPU calls behind a uniform tensor->tensor
interface (/root/reference/src/detection/text_detector.cpp:241-271).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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


# ---------- real decode kernels (codec-free container formats) ----------

def _read_pnm_header(b: bytes):
    """netpbm header scan: magic then 3 ASCII ints (w, h, maxval),
    whitespace-separated, '#' comments to end-of-line, then exactly one
    whitespace byte before the raster. Returns (w, h, maxval, offset)."""
    i, vals, n = 2, [], len(b)
    while len(vals) < 3:
        while i < n and b[i:i + 1].isspace():
            i += 1
        if i < n and b[i:i + 1] == b"#":
            j = b.find(b"\n", i)
            i = n if j < 0 else j + 1
            continue
        j = i
        while j < n and not b[j:j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("pnm: truncated header")
        vals.append(int(b[i:j]))
        i = j
    # exactly one whitespace byte separates maxval from the raster —
    # verify it IS whitespace (a non-space byte here means a malformed
    # header, not a raster that starts early), and absorb a CRLF pair
    # written as the separator so the raster offset is never skewed by
    # one byte (which would silently shift every pixel).
    if i >= n or not b[i:i + 1].isspace():
        raise ValueError("pnm: missing raster separator")
    if b[i:i + 1] == b"\r" and b[i + 1:i + 2] == b"\n":
        i += 1
    return vals[0], vals[1], vals[2], i + 1


def _decode_pnm(b: bytes):
    """Raw PGM (P5) / PPM (P6) -> (HxWx3 uint8, fmt). Grayscale is
    replicated to 3 channels so every image decode lands in one
    layout."""
    magic = bytes(b[:2])
    w, h, maxval, off = _read_pnm_header(b)
    if maxval > 255:
        raise NotImplementedError("pnm: 16-bit maxval requires pillow")
    if w <= 0 or h <= 0:
        raise ValueError("pnm: bad dimensions")
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    if len(b) < off + need:
        raise ValueError("pnm: truncated raster")
    arr = np.frombuffer(b, np.uint8, need, off).reshape(h, w, ch)
    if ch == 1:
        arr = np.repeat(arr, 3, axis=2)
    return np.ascontiguousarray(arr), ("ppm" if ch == 3 else "pgm")


def _decode_bmp(b: bytes):
    """Uncompressed BI_RGB BMP, 24/32 bpp -> (HxWx3 uint8, 'bmp').
    Handles 4-byte row padding, bottom-up (h > 0) and top-down (h < 0)
    pixel arrays, and drops the alpha byte of 32-bpp files."""
    if len(b) < 54:
        raise ValueError("bmp: truncated header")
    off = struct.unpack_from("<I", b, 10)[0]
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    comp = struct.unpack_from("<I", b, 30)[0]
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"bmp: compression={comp} bpp={bpp} requires pillow")
    if w <= 0 or h == 0:
        raise ValueError("bmp: bad dimensions")
    topdown, hh = h < 0, abs(h)
    stride = ((bpp // 8) * w + 3) & ~3
    if len(b) < off + stride * hh:
        raise ValueError("bmp: truncated pixel array")
    raw = np.frombuffer(b, np.uint8, stride * hh, off).reshape(hh, stride)
    px = raw[:, : (bpp // 8) * w].reshape(hh, w, bpp // 8)
    rgb = px[:, :, 2::-1]                       # BGR(A) -> RGB
    if not topdown:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb), "bmp"


def decode_image(payload: bytes):
    """REAL for codec-free formats (P5/P6 netpbm, uncompressed BMP);
    compressed codecs stay a clearly-marked pillow slot. Returns
    (HxWx3 uint8 array, fmt)."""
    if not payload:
        raise ValueError("image: empty payload")
    magic = bytes(payload[:2])
    if magic in (b"P5", b"P6"):
        return _decode_pnm(payload)
    if magic == b"BM":
        return _decode_bmp(payload)
    # REAL-DECODER SLOT for compressed codecs:
    # `from PIL import Image; Image.open(...)` — not in this container.
    raise NotImplementedError("image codec requires pillow (not in sandbox)")


def decode_wav(payload: bytes):
    """RIFF/WAVE PCM16 -> (int16 samples [n] or [n, ch], rate, ch).
    Walks word-aligned chunks (LIST/fact/etc. are skipped, not
    assumed absent); non-PCM or non-16-bit formats are the soundfile
    slot."""
    b = payload or b""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("wav: not RIFF/WAVE")
    i, fmt, data = 12, None, None
    while i + 8 <= len(b):
        cid = b[i:i + 4]
        sz = struct.unpack_from("<I", b, i + 4)[0]
        if i + 8 + sz > len(b):
            # a declared size past the buffer end means a truncated or
            # corrupt file: surface it as a decode-error rather than
            # silently returning fewer samples as a successful decode
            raise ValueError("wav: chunk size exceeds payload "
                             f"({cid!r} declares {sz} bytes, "
                             f"{len(b) - i - 8} remain)")
        body = b[i + 8:i + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + sz + (sz & 1)                  # chunks are word-aligned
    if fmt is None or len(fmt) < 16 or data is None:
        raise ValueError("wav: missing fmt/data chunk")
    audio_fmt, n_ch, rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if audio_fmt != 1 or bits != 16 or n_ch < 1:
        raise NotImplementedError(
            f"wav: format {audio_fmt}/{bits}-bit requires soundfile")
    samples = np.frombuffer(data[: len(data) & ~1], np.int16)
    if n_ch > 1:
        samples = samples[: (len(samples) // n_ch) * n_ch].reshape(-1, n_ch)
    return samples, rate, n_ch


# ---------- deterministic encoders (fixture/corpus builders) ----------

def make_ppm(w: int, h: int, pixels) -> bytes:
    """Raw P6 bytes. `pixels` is an (h, w, 3) uint8 array or one
    (r, g, b) tuple for a solid fill."""
    if isinstance(pixels, tuple):
        raster = bytes(pixels) * (w * h)
    else:
        raster = np.asarray(pixels, np.uint8).tobytes()
    return b"P6\n%d %d\n255\n" % (w, h) + raster


def make_bmp(w: int, h: int, pixels, topdown: bool = False) -> bytes:
    """Uncompressed 24-bpp BI_RGB BMP bytes (4-byte-padded rows).
    `pixels` as in make_ppm; rows are stored bottom-up unless
    `topdown` (negative height in the DIB header)."""
    if isinstance(pixels, tuple):
        arr = np.empty((h, w, 3), np.uint8)
        arr[:] = pixels
    else:
        arr = np.asarray(pixels, np.uint8).reshape(h, w, 3)
    bgr = arr[:, :, ::-1]
    if not topdown:
        bgr = bgr[::-1]
    stride = (3 * w + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : 3 * w] = bgr.reshape(h, 3 * w)
    body = rows.tobytes()
    dib = struct.pack("<IiiHHIIiiII", 40, w, -h if topdown else h,
                      1, 24, 0, len(body), 2835, 2835, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
    return hdr + dib + body


def make_wav(samples, rate: int = 8000) -> bytes:
    """RIFF/WAVE PCM16 mono bytes from an int16 sample array."""
    data = np.asarray(samples, np.int16).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def _decode_image(payload: bytes):
    """Back-compat alias for the featurizer's decode hook."""
    return decode_image(payload)


def _fake_feature(payload: bytes) -> np.ndarray:
    """Deterministic fake feature: 16 floats derived from the sha256 of
    the payload — a stand-in with the exact shape/dtype a real encoder
    would produce, so downstream joins/ANN code paths are exercised."""
    h = hashlib.sha256(payload or b"").digest()
    arr = np.frombuffer(h[:FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    return arr / 65535.0


def _image_feature(arr: np.ndarray) -> np.ndarray:
    """REAL 16-float image feature in [0, 1] from decoded pixels:
    per-channel mean and std (6), normalized dims (2), 8-bin luminance
    histogram fractions (8). Deterministic, order-independent."""
    f = arr.reshape(-1, 3).astype(np.float64)
    mean = f.mean(axis=0) / 255.0
    std = f.std(axis=0) / 255.0
    h, w = arr.shape[:2]
    dims = [min(w / 4096.0, 1.0), min(h / 4096.0, 1.0)]
    lum = f.mean(axis=1)
    hist = np.histogram(lum, bins=8, range=(0.0, 256.0))[0]
    hist = hist / max(lum.size, 1)
    return np.concatenate([mean, std, dims, hist]).astype(np.float32)


def _audio_feature(samples: np.ndarray, rate: int) -> np.ndarray:
    """REAL 16-float audio feature in [0, 1]: mean |amplitude|, std,
    peak, rate and duration terms (5), zero pad to 16 shared with an
    8-bin |amplitude| histogram (11)."""
    x = np.abs(samples.astype(np.float64).reshape(-1)) / 32768.0
    n = max(x.size, 1)
    head = [x.mean() if x.size else 0.0,
            x.std() if x.size else 0.0,
            x.max() if x.size else 0.0,
            min(rate / 96000.0, 1.0),
            min(x.size / (rate * 600.0), 1.0) if rate else 0.0]
    hist = np.histogram(x, bins=8, range=(0.0, 1.0 + 1e-9))[0] / n
    out = np.zeros(FEATURE_DIM, np.float64)
    out[:5] = head
    out[5:13] = hist
    return out.astype(np.float32)


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
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                if use_real_decoder:
                    # REAL for codec-free formats (ppm/pgm/bmp/wav-pcm);
                    # compressed codecs fall through the pillow/
                    # soundfile NotImplementedError slot to the stub.
                    try:
                        if kind == "audio":
                            samples, rate, _ = decode_wav(payload)
                            feats.append(_audio_feature(samples,
                                                        rate).tolist())
                            status.append("decoded:wav")
                        else:
                            arr, fmt = decode_image(payload)
                            feats.append(_image_feature(arr).tolist())
                            status.append(f"decoded:{fmt}")
                    except NotImplementedError:
                        feats.append(_fake_feature(payload).tolist())
                        status.append("stub-fallback")
                    except (ValueError, struct.error):
                        feats.append(_fake_feature(payload).tolist())
                        status.append("decode-error")
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


def _nn_resize(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample: source index = floor((i + 0.5) *
    in / out), the standard pixel-center mapping — deterministic,
    no float accumulation."""
    h, w = arr.shape[:2]
    yi = np.minimum(((np.arange(out_h) + 0.5) * h / out_h), h - 1) \
        .astype(np.int64)
    xi = np.minimum(((np.arange(out_w) + 0.5) * w / out_w), w - 1) \
        .astype(np.int64)
    return arr[yi][:, xi]


def resize_media(df: DataFrame, max_side: int = 224,
                 real_kernel: bool = False) -> DataFrame:
    """Image resize operator (the reference's pad/resize preprocessing
    analog, /root/reference/src/preprocessing/image_ops.cpp:31-58:
    cap the max side, preserve aspect). Output-geometry arithmetic,
    schema, and mapInPandas batch shape are always real; with
    `real_kernel` the pixels are REALLY resampled (nearest-neighbor)
    for codec-free payloads (ppm/pgm/bmp) and re-encoded as P6 — the
    pillow slot handles only the compressed formats.

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
            payloads = list(pdf["payload"])
            status = ["stub-passthrough"] * n
            if real_kernel:
                for i, p in enumerate(payloads):
                    # REAL kernel for codec-free formats; compressed
                    # codecs keep the PIL Image.resize slot semantics
                    # (passthrough, flagged)
                    try:
                        arr, fmt = decode_image(p)
                        small = _nn_resize(arr, int(out_w[i]),
                                           int(out_h[i]))
                        payloads[i] = make_ppm(int(out_w[i]),
                                               int(out_h[i]), small)
                        status[i] = f"resized:{fmt}"
                    except NotImplementedError:
                        pass
                    except (ValueError, struct.error):
                        status[i] = "resize-error"
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": payloads,
                "out_width": out_w.astype("int32"),
                "out_height": out_h.astype("int32"),
                "resize_status": status,
            })

    return (df.select("media_id", "payload", "width", "height")
            .mapInPandas(run, schema=RESIZE_SCHEMA))


DECODE_SCHEMA = ("media_id string, fmt string, width int, height int, "
                 "mean_r int, mean_g int, mean_b int, n_samples int, "
                 "mean_abs int, sample_rate int, decode_status string")


def decode_media(df: DataFrame) -> DataFrame:
    """REAL end-to-end decode: payload bytes -> measured facts
    (dims + per-channel pixel means for images, sample count / mean
    |amplitude| / rate for audio). Every number is read back out of
    the decoded array, so planting known values in synthesized
    payloads and comparing against an oracle certifies the byte-level
    decoders themselves — the analog of the reference's image-load
    stage feeding measured tensors to detection
    (/root/reference/src/preprocessing/image_ops.cpp:31-58).

    One mapInPandas hop (pdftext/warc discipline), per-row fault
    containment: a corrupt payload degrades that ROW to
    decode-error, never the batch.
    """
    def run(batches):
        for pdf in batches:
            out = {k: [] for k in ("media_id", "fmt", "width", "height",
                                   "mean_r", "mean_g", "mean_b",
                                   "n_samples", "mean_abs",
                                   "sample_rate", "decode_status")}
            nulls = ("width", "height", "mean_r", "mean_g", "mean_b",
                     "n_samples", "mean_abs", "sample_rate")

            def emit(mid, fmt, status, **vals):
                out["media_id"].append(mid)
                out["fmt"].append(fmt)
                out["decode_status"].append(status)
                for k in nulls:
                    out[k].append(vals.get(k))

            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                try:
                    if kind == "audio":
                        samples, rate, _ = decode_wav(payload)
                        x = np.abs(samples.astype(np.int64))
                        emit(mid, "wav", "decoded",
                             n_samples=int(samples.size),
                             mean_abs=int(round(float(x.mean())))
                             if samples.size else 0,
                             sample_rate=int(rate))
                    else:
                        arr, fmt = decode_image(payload)
                        f = arr.reshape(-1, 3).astype(np.float64)
                        mr, mg, mb = (int(round(v))
                                      for v in f.mean(axis=0))
                        emit(mid, fmt, "decoded",
                             width=int(arr.shape[1]),
                             height=int(arr.shape[0]),
                             mean_r=mr, mean_g=mg, mean_b=mb)
                    continue
                except NotImplementedError:
                    emit(mid, None, "needs-codec")
                except (ValueError, struct.error, OverflowError):
                    emit(mid, None, "decode-error")
            pdf_out = pd.DataFrame(out)
            for k in nulls:
                pdf_out[k] = pdf_out[k].astype("Int64")
            yield pdf_out

    return (df.select("media_id", "kind", "payload")
            .mapInPandas(run, schema=DECODE_SCHEMA))


# ---------- perceptual image dedup (dHash) ----------

DHASH_SCHEMA = "media_id long, dhash long, dhash_status string"


def dhash64_arr(arr: np.ndarray) -> int:
    """Classic difference hash: integer grayscale ((r+g+b)//3, exact —
    no float luma weights that could drift), nearest-neighbor resample
    to 9x8 with the same pixel-center kernel as resize_media, then one
    bit per adjacent-column comparison (left > right), row-major MSB
    first. 64 bits; near-duplicate images (rescaled, re-encoded,
    slightly retouched) land within a small hamming radius — the
    image-side analog of simhash64 over text."""
    g = (arr[..., 0].astype(np.int64) + arr[..., 1] + arr[..., 2]) // 3
    small = _nn_resize(g, 9, 8)
    bits = (small[:, :-1] > small[:, 1:]).ravel()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v  # signed long


def with_dhash(df: DataFrame) -> DataFrame:
    """(media_id, payload) -> (media_id, dhash, dhash_status). One
    mapInPandas hop, per-row fault containment (decode_media
    discipline): a corrupt payload degrades that row to
    dhash-error / needs-codec with a NULL hash, never the batch."""
    def run(batches):
        for pdf in batches:
            ids, hashes, status = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                ids.append(mid)
                try:
                    arr, _ = decode_image(payload)
                    hashes.append(dhash64_arr(arr))
                    status.append("hashed")
                except NotImplementedError:
                    hashes.append(None)
                    status.append("needs-codec")
                except (ValueError, struct.error, OverflowError):
                    hashes.append(None)
                    status.append("dhash-error")
            # pd.array, NOT astype("Int64"): astype routes the object
            # column through float64 and silently zeroes the low bits
            # of 64-bit hashes (first caught as a partitioning-
            # dependent pair set in tests)
            yield pd.DataFrame({
                "media_id": ids,
                "dhash": pd.array(hashes, dtype="Int64"),
                "dhash_status": status,
            })

    return (df.select("media_id", "payload")
            .mapInPandas(run, schema=DHASH_SCHEMA))


def image_dhash_pairs(df: DataFrame, max_hamming: int = 2) -> DataFrame:
    """Near-duplicate image pairs: dHash signatures joined with the
    SAME (d+1)-piece pigeonhole equi-join as text SimHash
    (dedup.hamming_pairs — complete recall within the radius by
    construction, never O(n^2)). Input (media_id, payload); returns
    (a, b, hamming) with a < b. Rows that fail to decode are excluded
    (NULL signatures can't be near anything)."""
    from dxnn_ocr_cpp_spark.operators.dedup import hamming_pairs
    sigs = with_dhash(df).filter(F.col("dhash").isNotNull())
    return hamming_pairs(sigs, max_hamming,
                         id_col="media_id", sig_col="dhash")


def synthesize_patterned_images(docs: DataFrame, n_groups: int = 25,
                                corrupt_every: int = 37) -> DataFrame:
    """Deterministic patterned-image table for the dHash certification
    query: doc_id % n_groups picks a 16x12 pattern whose pixels are a
    pure integer function of (x, y, group), so images in the same
    group are byte-identical (hamming 0) while distinct groups sit far
    apart in hamming space (>=8 bits measured across 25 groups —
    pinned by tests). Every corrupt_every-th doc truncates the payload
    (planted per-row decode failures). A SQL oracle replays group
    arithmetic without touching bytes."""
    ng, ce = int(n_groups), int(corrupt_every)

    def build(batches):
        x = np.arange(16)[None, :]
        y = np.arange(12)[:, None]
        pats = {}
        for g in range(ng):
            val = ((((x + 17 * g) * 73856093)
                    ^ ((y + 31 * g) * 19349663)) >> 8) & 0xFF
            pats[g] = make_ppm(16, 12, np.repeat(
                val.astype(np.uint8)[..., None], 3, axis=2))
        for pdf in batches:
            ids, payloads = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                p = pats[did % ng]
                if ce and did % ce == 0:
                    p = p[:10]
                ids.append(did)
                payloads.append(p)
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(
        build, schema="media_id long, payload binary")


# ---------- perceptual audio dedup (energy-delta fingerprint) ----------

AFP_WINDOW = 64          # samples per energy window
AFP_WINDOWS = 65         # windows -> 64 delta bits

AFP_SCHEMA = "media_id long, afp long, afp_status string"


def afp64_samples(samples: np.ndarray) -> int:
    """64-bit audio fingerprint: mean-|amplitude| energy over 65
    fixed 64-sample windows, one bit per adjacent-window comparison
    (later > earlier), MSB first — a deterministic integer-only
    chromaprint-style sketch. Robust to constant gain re-scaling
    being monotone (comparisons survive any positive gain) — the
    audio-side analog of dhash64_arr. Requires >= 65*64 samples."""
    need = AFP_WINDOWS * AFP_WINDOW
    if samples.size < need:
        raise ValueError(f"afp64: need >= {need} samples, "
                         f"got {samples.size}")
    x = np.abs(samples[:need].astype(np.int64)) \
        .reshape(AFP_WINDOWS, AFP_WINDOW).sum(axis=1)
    v = 0
    for b in (x[1:] > x[:-1]):
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def with_audio_fp(df: DataFrame) -> DataFrame:
    """(media_id, payload WAV bytes) -> (media_id, afp, afp_status).
    One mapInPandas hop, per-row fault containment; too-short clips
    degrade to afp-error (a fingerprint of near-zero windows would
    collide everything, so refusing is the honest behavior)."""
    def run(batches):
        for pdf in batches:
            ids, fps, status = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                ids.append(mid)
                try:
                    samples, _rate, _w = decode_wav(payload)
                    fps.append(afp64_samples(samples))
                    status.append("fingerprinted")
                except (ValueError, struct.error, OverflowError):
                    fps.append(None)
                    status.append("afp-error")
            yield pd.DataFrame({
                "media_id": ids,
                # pd.array: exact 64-bit ints (see with_dhash note)
                "afp": pd.array(fps, dtype="Int64"),
                "afp_status": status,
            })

    return (df.select("media_id", "payload")
            .mapInPandas(run, schema=AFP_SCHEMA))


def audio_fp_pairs(df: DataFrame, max_hamming: int = 2) -> DataFrame:
    """Near-duplicate audio pairs via the shared pigeonhole hamming
    join (dedup.hamming_pairs) over afp64 signatures. Input
    (media_id, payload); returns (a, b, hamming), a < b."""
    from dxnn_ocr_cpp_spark.operators.dedup import hamming_pairs
    sigs = with_audio_fp(df).filter(F.col("afp").isNotNull())
    return hamming_pairs(sigs, max_hamming,
                         id_col="media_id", sig_col="afp")


def synthesize_patterned_audio(docs: DataFrame, n_groups: int = 25,
                               corrupt_every: int = 37) -> DataFrame:
    """Deterministic patterned-WAV table for the fingerprint
    certification query: doc_id % n_groups picks a 65-window amplitude
    pattern (pure integer function of (window, group)), so same-group
    clips are byte-identical while distinct groups sit >= 11 hamming
    bits apart (margin pinned by tests). Every corrupt_every-th doc
    truncates the payload (planted per-row decode failures)."""
    ng, ce = int(n_groups), int(corrupt_every)

    def build(batches):
        w = np.arange(AFP_WINDOWS)
        pats = {}
        for g in range(ng):
            amp = ((((w + 29 * g) * 73856093)
                    ^ ((w * w + g) * 19349663)) >> 8) & 0x3FF
            pats[g] = make_wav(
                np.repeat(amp.astype(np.int16), AFP_WINDOW), 8000)
        for pdf in batches:
            ids, payloads = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                p = pats[did % ng]
                if ce and did % ce == 0:
                    p = p[:10]
                ids.append(did)
                payloads.append(p)
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(
        build, schema="media_id long, payload binary")


def synthesize_media(docs: DataFrame, corrupt_every: int = 17) -> DataFrame:
    """Deterministic codec-free media table derived from doc_id —
    the fixture source for the decode certification query. Planted
    ground truth (all pure integer functions of doc_id, so a SQL
    oracle can replay them without touching bytes):

      doc_id % 3 == 0 -> solid-color P6 PPM   (w, h, r, g, b planted)
      doc_id % 3 == 1 -> solid-color 24bpp BMP (same planted fields)
      doc_id % 3 == 2 -> constant-amplitude PCM16 WAV (n, amp, rate)

    Every corrupt_every-th doc_id truncates the payload to 10 bytes —
    planted decode failures that must degrade per-row.
    """
    def build(batches):
        for pdf in batches:
            ids, kinds, payloads = [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 4 + did % 13, 3 + did % 11
                rgb = ((did * 37) % 256, (did * 59) % 256,
                       (did * 83) % 256)
                sel = did % 3
                if sel == 0:
                    kind, payload = "image", make_ppm(w, h, rgb)
                elif sel == 1:
                    kind, payload = "image", make_bmp(w, h, rgb)
                else:
                    n = 200 + did % 50
                    amp = (did * 29) % 2000
                    rate = 8000 + (did % 5) * 1000
                    kind = "audio"
                    payload = make_wav(np.full(n, amp, np.int16), rate)
                if corrupt_every and did % corrupt_every == 0:
                    payload = payload[:10]
                ids.append(f"m{did}")
                kinds.append(kind)
                payloads.append(payload)
            yield pd.DataFrame({"media_id": ids, "kind": kinds,
                                "payload": payloads})

    return docs.select("doc_id").mapInPandas(
        build, schema="media_id string, kind string, payload binary")
