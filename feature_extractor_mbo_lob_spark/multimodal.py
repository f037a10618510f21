"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, decoded by REAL dependency-free codecs inside mapInPandas.

Decode is NOT stubbed: `decode_media` / `_decode_payload` parse RIFF/WAVE
PCM16 audio, P6 PPM and 24bpp BMP images with pure numpy+struct and emit
per-item dims/sample-rate/mean/std; `_decode_pixels` and
`resize_images` operate on the actual pixel arrays. Only
`extract_media_features` (the generic any-bytes embedding stage) uses a
deterministic byte-hash stand-in, for formats that would need external
libraries (JPEG/MP3/video) — swapping in PIL/torchaudio there is a local
change inside one mapInPandas function; the distributed plan (schema,
partitioning, Arrow batch shape) is unchanged.

Scale notes: binary payloads ride in their own column so Parquet column
pruning skips them unless a stage needs bytes; mapInPandas streams Arrow
batches (bounded memory via spark.sql.execution.arrow.maxRecordsPerBatch);
decode stages repartition by size-balanced buckets (`repartition_by_bytes`),
not row counts.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image | audio | video
    T.StructField("mime", T.StringType(), True),
    T.StructField("payload", T.BinaryType(), True),      # opaque bytes
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
])

FEATURE_DIM = 8  # deterministic fake embedding width


def synth_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = repeating hash bytes."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(F.repeat(F.md5(F.concat(F.lit(seed), F.col("id"))), 4), "utf-8").alias("payload"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(1920)) + 1).cast("int").alias("width"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 2)), F.lit(1080)) + 1).cast("int").alias("height"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 3)), F.lit(60000)) + 1).cast("int").alias("duration_ms"),
    )
    return df


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: bytes -> FEATURE_DIM floats.
    REPLACE with PIL/torchaudio decode when the libs exist."""
    if payload is None:
        return np.zeros(FEATURE_DIM)
    a = np.frombuffer(payload[: FEATURE_DIM * 4], dtype=np.uint8).astype(np.float64)
    a = np.resize(a, FEATURE_DIM)
    return a / 255.0


def extract_media_features(df: DataFrame, batch_col: str = "payload") -> DataFrame:
    """mapInPandas feature extraction: (media_id, kind, features array<double>).
    Arrow-batched; the per-batch loop is numpy over the binary column."""
    out_schema = "media_id long, kind string, features array<double>"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(p).tolist() for p in pdf[batch_col]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "features": feats,
            })

    return df.mapInPandas(fn, schema=out_schema)


# ---------------------------------------------------------------------------
# Real dependency-free codecs: WAV (RIFF/PCM16), PPM (P6), BMP (24bpp).
# Generation formulas are frozen so the DuckDB oracle can predict every
# decoded value in closed form (two-tone payloads: first half value A,
# second half value B -> mean (A+B)/2, population std |A-B|/2, both exact).
# ---------------------------------------------------------------------------

def _wav_params(m: int):
    a = m % 200 - 100
    b = (m * 7) % 200 - 100
    rate = 8000 + (m % 100)
    n_samples = 64 + 2 * (m % 32)
    return a, b, rate, n_samples


def _ppm_params(m: int):
    w = 2 * (1 + m % 8)
    h = 1 + m % 8
    pa = m % 256
    pb = (m * 7) % 256
    return w, h, pa, pb


def _bmp_params(m: int):
    w = 4 * (1 + m % 6)  # width % 4 == 0 -> no row padding
    h = 1 + m % 8
    pa = m % 256
    pb = (m * 7) % 256
    return w, h, pa, pb


def _two_tone(count: int, lo, hi, dtype) -> np.ndarray:
    arr = np.empty(count, dtype=dtype)
    arr[: count // 2] = lo
    arr[count // 2:] = hi
    return arr


def _encode_wav(m: int) -> bytes:
    import struct

    a, b, rate, n = _wav_params(m)
    samples = _two_tone(n, a, b, np.int16)
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)  # PCM16 mono
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


def _encode_ppm(m: int) -> bytes:
    w, h, pa, pb = _ppm_params(m)
    header = f"P6\n{w} {h}\n255\n".encode()
    return header + _two_tone(w * h * 3, pa, pb, np.uint8).tobytes()


def _encode_bmp(m: int) -> bytes:
    import struct

    w, h, pa, pb = _bmp_params(m)
    pixels = _two_tone(w * h * 3, pa, pb, np.uint8).tobytes()
    offset = 14 + 40
    header = b"BM" + struct.pack("<IHHI", offset + len(pixels), 0, 0, offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    return header + info + pixels


def synth_media_real(spark, n: int = 200) -> DataFrame:
    """Deterministic REAL media payloads (valid WAV/PPM/BMP files) —
    kind = [wav, ppm, bmp][media_id % 3]. Generated in an Arrow-batched
    mapInPandas; every byte is a pure function of media_id, so the decode
    oracle predicts all stats in closed form."""
    out_schema = "media_id long, fmt string, payload binary"
    encoders = {0: ("wav", _encode_wav), 1: ("ppm", _encode_ppm), 2: ("bmp", _encode_bmp)}

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].tolist()
            fmts, payloads = [], []
            for m in ids:
                fmt, enc = encoders[m % 3]
                fmts.append(fmt)
                payloads.append(enc(int(m)))
            yield pd.DataFrame({"media_id": ids, "fmt": fmts, "payload": payloads})

    # few fat partitions: per-partition Python-worker spin-up dominates tiny
    # synthetic tables (scale n up -> partitions scale with it)
    n_parts = max(2, min(8, n // 64))
    return spark.range(0, n, 1, n_parts).mapInPandas(gen, schema=out_schema)


def _decode_payload(fmt: str, payload: bytes):
    """Parse one real media file; returns (width, height, channels,
    sample_rate, n_units, mean, std) with NULLs as None. Pure numpy/struct."""
    import struct

    if fmt == "wav":
        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE file")
        pos, channels, rate, bits, data = 12, None, None, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos:pos + 4]
            clen = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
            body = payload[pos + 8:pos + 8 + clen]
            if cid == b"fmt ":
                _, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            elif cid == b"data":
                data = body
            pos += 8 + clen + (clen & 1)
        if data is None or bits != 16:
            raise ValueError("missing PCM16 data chunk")
        arr = np.frombuffer(data, dtype=np.int16).astype(np.int64)
        w = h = None
        ch, sr, n_units = channels, rate, len(arr)
    elif fmt == "ppm":
        if payload[:2] != b"P6":
            raise ValueError("not a P6 PPM")
        fields, pos = [], 2
        while len(fields) < 3:
            while payload[pos:pos + 1].isspace():
                pos += 1
            start = pos
            while not payload[pos:pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        pos += 1  # single whitespace after maxval
        w, h, _maxval = fields
        arr = np.frombuffer(payload[pos:pos + w * h * 3], dtype=np.uint8).astype(np.int64)
        ch, sr, n_units = 3, None, w * h * 3
    elif fmt == "bmp":
        if payload[:2] != b"BM":
            raise ValueError("not a BMP")
        offset = struct.unpack("<I", payload[10:14])[0]
        w = struct.unpack("<i", payload[18:22])[0]
        h = struct.unpack("<i", payload[22:26])[0]
        bpp = struct.unpack("<H", payload[28:30])[0]
        if bpp != 24 or (w * 3) % 4:
            raise ValueError("only unpadded 24bpp BMP supported")
        arr = np.frombuffer(payload[offset:offset + w * h * 3], dtype=np.uint8).astype(np.int64)
        ch, sr, n_units = 3, None, w * h * 3
    else:
        raise ValueError(f"unknown media format {fmt}")

    cnt = len(arr)
    s = int(arr.sum())
    s2 = int((arr * arr).sum())
    mean = s / cnt
    var = s2 / cnt - mean * mean
    std = float(np.sqrt(max(var, 0.0)))
    return w, h, ch, sr, n_units, mean, std


def decode_media(df: DataFrame, fmt_col: str = "fmt",
                 payload_col: str = "payload") -> DataFrame:
    """Real decode stage: parses WAV/PPM/BMP headers + payload stats in pure
    numpy inside mapInPandas (Arrow-batched; the payload column is pruned
    from every stage that doesn't call this)."""
    out_schema = (
        "media_id long, fmt string, width int, height int, channels int, "
        "sample_rate int, n_units long, val_mean double, val_std double"
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(mid),) + tuple([fmt]) + _decode_payload(fmt, bytes(pl))
                for mid, fmt, pl in zip(pdf["media_id"], pdf[fmt_col], pdf[payload_col])
            ]
            yield pd.DataFrame(
                rows,
                columns=["media_id", "fmt", "width", "height", "channels",
                         "sample_rate", "n_units", "val_mean", "val_std"],
            )

    return df.mapInPandas(fn, schema=out_schema)


def _decode_pixels(fmt: str, payload: bytes):
    """(h, w, 3) uint8 pixel array from a PPM/BMP payload (BMP rows are
    stored bottom-up; flipped to top-down here)."""
    import struct

    if fmt == "ppm":
        fields, pos = [], 2
        while len(fields) < 3:
            while payload[pos:pos + 1].isspace():
                pos += 1
            start = pos
            while not payload[pos:pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        pos += 1
        w, h, _ = fields
        px = np.frombuffer(payload[pos:pos + w * h * 3], dtype=np.uint8)
        return px.reshape(h, w, 3)
    if fmt == "bmp":
        offset = struct.unpack("<I", payload[10:14])[0]
        w = struct.unpack("<i", payload[18:22])[0]
        h = struct.unpack("<i", payload[22:26])[0]
        px = np.frombuffer(payload[offset:offset + w * h * 3], dtype=np.uint8)
        return px.reshape(h, w, 3)[::-1]  # bottom-up -> top-down
    raise ValueError(f"not an image format: {fmt}")


def _encode_ppm_pixels(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


def resize_images(df: DataFrame, width: int, height: int,
                  fmt_col: str = "fmt", payload_col: str = "payload") -> DataFrame:
    """Real image resize: nearest-neighbor resampling in pure numpy inside
    mapInPandas (filter to image formats -> Arrow batches -> PPM out).
    Nearest-neighbor index math is one fancy-index gather per image — no
    per-pixel Python. Output payloads are P6 PPM at the target size."""
    out_schema = "media_id long, fmt string, payload binary, width int, height int"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fmts, payloads = [], [], []
            for mid, fmt, pl in zip(pdf["media_id"], pdf[fmt_col], pdf[payload_col]):
                img = _decode_pixels(fmt, bytes(pl))
                h0, w0, _ = img.shape
                yi = (np.arange(height) * h0) // height
                xi = (np.arange(width) * w0) // width
                resized = img[yi][:, xi]
                ids.append(int(mid))
                fmts.append("ppm")
                payloads.append(_encode_ppm_pixels(resized))
            yield pd.DataFrame({
                "media_id": ids, "fmt": fmts, "payload": payloads,
                "width": width, "height": height,
            })

    return df.filter(F.col(fmt_col).isin("ppm", "bmp")).mapInPandas(fn, schema=out_schema)


def sample_video_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling stage — deterministic fake: emits one row per sampled
    timestamp with a fake frame fingerprint (plan + explode shape real;
    decode stubbed)."""
    frames = df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest((F.col("duration_ms") / every_ms).cast("int") - 1, F.lit(0)))
        ).alias("frame_no"),
    )
    return frames.withColumn(
        "frame_fingerprint", F.md5(F.concat_ws(":", "media_id", "frame_no"))
    )


def repartition_by_bytes(df: DataFrame, target_bytes: int,
                         id_col: str = "media_id",
                         payload_col: str = "payload",
                         isolate_top: int = 16) -> DataFrame:
    """Size-balanced repartition for binary-payload stages: decode cost is
    proportional to BYTES, not rows, so row-count partitioning starves some
    tasks and drowns others.

    Two-phase, no global sort: (1) one narrow aggregate gives total bytes,
    and a TakeOrdered gives the `isolate_top` largest payloads (driver gets
    K ids, never payloads); (2) each giant gets a DEDICATED bucket, the
    rest hash into ceil(remaining/target) buckets — law of large numbers
    balances the hashed mass once rows >> buckets, and the isolated heavy
    tail can no longer blow a bucket past ~target + max_regular_payload.
    This is the skew treatment the decode docstring promises (same
    isolate-the-stragglers idea as operators/skew.py, applied to bytes).
    """
    b = F.octet_length(F.col(payload_col))
    sized = df.withColumn("_bytes", b)

    big = [
        (r[0], r[1])
        for r in sized.select(id_col, "_bytes")
        .orderBy(F.col("_bytes").desc(), F.col(id_col))
        .limit(int(isolate_top))
        .collect()
    ]
    big_ids = [i for i, _ in big]
    big_bytes = sum(n for _, n in big)
    total = sized.agg(F.sum("_bytes")).collect()[0][0] or 0

    n_regular = max(1, -(-(int(total) - int(big_bytes)) // int(target_bytes)))
    mapping = F.when(F.col(id_col).isin(big_ids), F.lit(None)).otherwise(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_regular))
    )
    bucket = F.coalesce(
        mapping,
        # dedicated buckets n_regular..n_regular+K-1 for the giants
        F.lit(n_regular)
        + F.array_position(F.array(*[F.lit(i) for i in big_ids]), F.col(id_col))
        - 1,
    )
    out = sized.withColumn("_sbucket", bucket.cast("int")).drop("_bytes")
    return out.repartition(n_regular + len(big_ids), "_sbucket")


def _pcm16_samples(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM16 sample array + sample rate from a RIFF/WAVE payload (reuses
    the chunk walk of _decode_payload; raises on non-WAV)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, bits, data = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        clen = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            _, _, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)
    if data is None or bits != 16:
        raise ValueError("missing PCM16 data chunk")
    return np.frombuffer(data, dtype=np.int16).astype(np.float64), int(rate)


def audio_spectral_features(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Real DSP feature extraction over WAV payloads: RMS energy,
    zero-crossing rate, spectral centroid and 85% rolloff from one rFFT
    per clip — numpy inside mapInPandas, Arrow-batched, no external
    audio library. Non-WAV rows are passed through with NULL features
    (schema-stable), mirroring decode_media's column-pruning behaviour:
    stages that don't call this never read the payload bytes.

    At 100 TB the clips ride size-balanced buckets
    (repartition_by_bytes) so one task never holds a pathological batch
    of long clips.
    """
    out_schema = (
        "media_id long, rms double, zcr double, "
        "spectral_centroid_hz double, rolloff_hz double"
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, fmt, pl in zip(pdf["media_id"], pdf["fmt"], pdf[payload_col]):
                if fmt != "wav":
                    rows.append((int(mid), None, None, None, None))
                    continue
                x, rate = _pcm16_samples(bytes(pl))
                n = len(x)
                if n == 0:
                    rows.append((int(mid), 0.0, 0.0, 0.0, 0.0))
                    continue
                rms = float(np.sqrt(np.mean(x * x)))
                zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 else 0.0
                mag = np.abs(np.fft.rfft(x))
                freqs = np.fft.rfftfreq(n, d=1.0 / rate)
                tot = float(mag.sum())
                if tot <= 0.0:
                    cent = roll = 0.0
                else:
                    cent = float((freqs * mag).sum() / tot)
                    cum = np.cumsum(mag)
                    roll = float(freqs[int(np.searchsorted(cum, 0.85 * tot))])
                rows.append((int(mid), rms, zcr, cent, roll))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "rms", "zcr", "spectral_centroid_hz", "rolloff_hz"],
            )

    return df.mapInPandas(fn, schema=out_schema)


def image_dhash(
    df: DataFrame,
    hash_size: int = 8,
    fmt_col: str = "fmt",
    payload_col: str = "payload",
) -> DataFrame:
    """Perceptual difference-hash (dHash) of image payloads: grayscale ->
    nearest-neighbor downscale to (hash_size+1, hash_size) -> horizontal
    gradient sign bits packed into an int64. Near-identical images land
    within a few Hamming bits, so image-level near-dup detection reuses
    the SimHash chunk-key LSH machinery unchanged (operators/dedup
    .simhash_candidates over the packed value).

    Pure numpy inside mapInPandas; non-image rows pass through with NULL.
    hash_size=8 gives the standard 64-bit fingerprint.
    """
    if hash_size * hash_size > 64:
        raise ValueError("dHash must fit in int64")
    out_schema = "media_id long, dhash long, fmt string"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, fmt, pl in zip(pdf["media_id"], pdf[fmt_col], pdf[payload_col]):
                if fmt not in ("ppm", "bmp"):
                    rows.append((int(mid), None, fmt))
                    continue
                img = _decode_pixels(fmt, bytes(pl))
                # integer luma (ITU-R 601-ish, pure int math: 299/587/114)
                gray = (
                    299 * img[:, :, 0].astype(np.int64)
                    + 587 * img[:, :, 1].astype(np.int64)
                    + 114 * img[:, :, 2].astype(np.int64)
                )
                h, w = gray.shape
                ys = (np.arange(hash_size) * h) // hash_size
                xs = (np.arange(hash_size + 1) * w) // (hash_size + 1)
                small = gray[np.ix_(ys, xs)]
                bits = (small[:, 1:] > small[:, :-1]).ravel()
                val = 0
                for b in bits:
                    val = (val << 1) | int(b)
                # keep int64-signed-safe: 64 bits with top bit possible ->
                # wrap to signed
                if val >= 1 << 63:
                    val -= 1 << 64
                rows.append((int(mid), val, fmt))
            yield pd.DataFrame(rows, columns=["media_id", "dhash", "fmt"])

    return df.mapInPandas(fn, schema=out_schema)


def _wav_pcm16(payload: bytes) -> np.ndarray:
    """PCM16 sample array (int64) from a RIFF/WAVE payload — the chunk walk
    `_decode_payload` does, factored for stages that need the raw samples."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, bits, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        clen = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            bits = struct.unpack("<HHIIHH", body[:16])[5]
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)
    if data is None or bits != 16:
        raise ValueError("missing PCM16 data chunk")
    return np.frombuffer(data, dtype=np.int16).astype(np.int64)


def _phash_bands(fmt: str, payload: bytes, grid: int = 8) -> list[int]:
    """64-bit average-hash perceptual fingerprint of one media payload,
    returned as four 16-bit band integers (the LSH band structure the
    near-dup join keys on — and no int64 sign-bit hazards at bit 63).

    Images (PPM/BMP): decode to top-down pixels, integer grayscale
    (r+g+b)//3, nearest-neighbor grid sample at (gy*h)//grid, (gx*w)//grid,
    threshold at the integer mean of the grid. Audio (WAV): the same
    construction over grid*grid nearest-neighbor samples of the PCM16
    waveform shifted to nonnegative (+32768), so the integer mean uses
    truncating division identically in every engine. Every step is exact
    integer arithmetic — the DuckDB oracle reproduces the hash bit for bit
    in closed form from media_id (q_phash_media_pairs).
    """
    if fmt in ("ppm", "bmp"):
        img = _decode_pixels(fmt, payload).astype(np.int64)
        gray = img.sum(axis=2) // 3
        h, w = gray.shape
        ys = (np.arange(grid) * h) // grid
        xs = (np.arange(grid) * w) // grid
        vals = gray[np.ix_(ys, xs)].ravel()
    elif fmt == "wav":
        samples = _wav_pcm16(payload) + 32768
        n = len(samples)
        idx = (np.arange(grid * grid) * n) // (grid * grid)
        vals = samples[idx]
    else:
        raise ValueError(f"unknown media format {fmt}")
    mean = int(vals.sum()) // vals.size
    bits = (vals > mean).astype(np.int64)
    weights = 1 << np.arange(16, dtype=np.int64)
    return [int((bits[b * 16:(b + 1) * 16] * weights).sum()) for b in range(4)]


def phash_fingerprints(df: DataFrame, fmt_col: str = "fmt",
                       payload_col: str = "payload", grid: int = 8) -> DataFrame:
    """Perceptual-hash fingerprint stage: (media_id, fmt, band0..band3
    int) via Arrow-batched mapInPandas over the binary payload column.
    Parquet column pruning keeps payload bytes out of every stage that
    doesn't call this."""
    out_schema = "media_id long, fmt string, band0 int, band1 int, band2 int, band3 int"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(mid), fmt, *_phash_bands(fmt, bytes(pl), grid))
                for mid, fmt, pl in zip(
                    pdf["media_id"], pdf[fmt_col], pdf[payload_col]
                )
            ]
            yield pd.DataFrame(
                rows,
                columns=["media_id", "fmt", "band0", "band1", "band2", "band3"],
            )

    return df.mapInPandas(fn, schema=out_schema)


def phash_near_dup(fp: DataFrame, max_hamming: int = 6,
                   max_band_bucket: int = 100_000) -> DataFrame:
    """Banded near-duplicate join over phash fingerprints: candidates are
    pairs (same fmt) agreeing EXACTLY on at least one of the four 16-bit
    bands, verified by the exact Hamming distance
    sum(bit_count(xor(band_i_a, band_i_b))). Pigeonhole over 4 bands
    guarantees full recall for distance <= 3; above that, banding is the
    standard LSH recall/candidate-volume trade (the oracle mirrors the
    same candidate rule, so verification is exact either way).

    Scale: the self-equi-join shuffles on (fmt, band_no, band_val) digests
    only; ``max_band_bucket`` drops degenerate band buckets past the cap
    (the MinHash hot-band lesson, operators/dedup.py — at corpus scale
    route oversize buckets through exact-dup grouping first; the cap here
    keeps the worst case bounded and LOUD rather than a straggler task).
    """
    melted = fp.select(
        "media_id", "fmt", "band0", "band1", "band2", "band3",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("bno"), F.col(f"band{i}").alias("bval"))
                for i in range(4)
            ])
        ).alias("bk"),
    ).select("media_id", "fmt", "band0", "band1", "band2", "band3",
             F.col("bk.bno").alias("bno"), F.col("bk.bval").alias("bval"))
    counts = melted.groupBy("fmt", "bno", "bval").agg(
        F.count(F.lit(1)).alias("_bucket_n")
    )
    bounded = melted.join(
        counts.where(F.col("_bucket_n") <= int(max_band_bucket)),
        ["fmt", "bno", "bval"],
    )
    a, b = bounded.alias("pa"), bounded.alias("pb")
    cand = (
        a.join(
            b,
            (F.col("pa.fmt") == F.col("pb.fmt"))
            & (F.col("pa.bno") == F.col("pb.bno"))
            & (F.col("pa.bval") == F.col("pb.bval"))
            & (F.col("pa.media_id") < F.col("pb.media_id")),
        )
        .select(
            F.col("pa.media_id").alias("id_a"),
            F.col("pb.media_id").alias("id_b"),
            F.col("pa.fmt").alias("fmt"),
            *[F.col(f"pa.band{i}").alias(f"a{i}") for i in range(4)],
            *[F.col(f"pb.band{i}").alias(f"b{i}") for i in range(4)],
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = sum(
        F.bit_count(F.col(f"a{i}").bitwiseXOR(F.col(f"b{i}")).cast("long"))
        for i in range(4)
    )
    return (
        cand.select("id_a", "id_b", "fmt", ham.cast("long").alias("hamming"))
        .where(F.col("hamming") <= int(max_hamming))
    )
