"""Streaming variants (driven with MemoryStream/foreachBatch), batch error
modes, chronological split, multimodal plumbing."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from feature_extractor_mbo_lob_spark import multimodal
from feature_extractor_mbo_lob_spark.batch import chronological_split, run_job, split_quarantine
from feature_extractor_mbo_lob_spark.config import PipelineConfig
from feature_extractor_mbo_lob_spark.sources import TRANSCRIPT_SCHEMA
from feature_extractor_mbo_lob_spark.streaming import stream as strm

T0 = dt.datetime(2024, 1, 1)
CFG = PipelineConfig(window_sizes=(4,), session_gap_s=300.0, volume_target=15.0)


def ts(s):
    return T0 + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def turns(spark):
    rows = [
        ("a", 0, "user", "hello", None, ts(0)),
        ("a", 1, "assistant", "hi there", None, ts(10)),
        ("a", 2, "user", "ok then", None, ts(400)),   # gap > 300 -> new session
        ("a", 3, "tool", "result", "t1", ts(410)),
        ("b", 0, "user", "solo", None, ts(5)),
    ]
    return spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)


# --- streaming -----------------------------------------------------------------

def _run_stream(spark, turns, builder):
    """Drive a streaming transform over a file source with one batch."""
    import tempfile, uuid

    src = tempfile.mkdtemp(prefix="strm_src")
    turns.write.mode("overwrite").parquet(src)
    stream_in = spark.readStream.schema(turns.schema).parquet(src)
    out = builder(stream_in)
    name = "m" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if out.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_streaming_sessions(spark, turns):
    # a far-future flusher row advances the global watermark past every real
    # session so append mode emits them under availableNow
    flusher = spark.createDataFrame(
        [("zz", 0, "user", "flush", None, ts(100000))], schema=TRANSCRIPT_SCHEMA
    )
    src = turns.unionByName(flusher)
    res = _run_stream(
        spark, src, lambda s: strm.streaming_sessions(s, CFG, watermark="1 second")
    )
    rows = {(r.conv_id, r.session_start): r for r in res.collect()}
    a_sessions = [r for (c, _), r in rows.items() if c == "a"]
    assert len(a_sessions) == 2
    by_turns = sorted(r.n_turns for r in a_sessions)
    assert by_turns == [2, 2]


def test_session_window_exact_gap_boundary_merges(spark):
    """Pins the boundary convention the streaming_sessions oracle relies on:
    Spark session_window MERGES an event landing exactly gap seconds after
    the previous one (new session only when diff > gap) — matching the
    batch sessionizer's strict `> gap` rule. If a Spark upgrade flips this
    to half-open windows, this test catches it before the oracle drifts."""
    from pyspark.sql import functions as F

    gap = int(CFG.session_gap_s)
    rows = [("a", ts(0)), ("a", ts(gap)),        # exactly gap apart -> merge
            ("b", ts(0)), ("b", ts(gap + 1))]    # one past gap -> split
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp")
    out = df.groupBy(
        "conv_id", F.session_window("ts", f"{gap} seconds")
    ).agg(F.count(F.lit(1)).alias("n"))
    got = sorted((r.conv_id, r.n) for r in out.collect())
    assert got == [("a", 2), ("b", 1), ("b", 1)]


def test_streaming_cumulative_state_and_sampler(spark, turns):
    res = _run_stream(spark, turns, lambda s: strm.streaming_cumulative_state(s, CFG))
    rows = {(r.conv_id, r.turn_idx): r for r in res.collect()}
    assert rows[("a", 3)].turns_so_far == 4
    assert rows[("a", 3)].tool_turns_so_far == 1
    assert rows[("a", 3)].chars_so_far == 5 + 8 + 7 + 6
    # volume target 15: acc 5,13,20*->fire reset, 6
    assert [rows[("a", i)].is_sample for i in range(4)] == [0, 0, 1, 0]
    assert rows[("b", 0)].turns_so_far == 1


# --- batch ops --------------------------------------------------------------------

def test_quarantine_modes(spark, turns):
    from pyspark.sql import types as T

    nullable_schema = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in TRANSCRIPT_SCHEMA.fields]
    )
    bad_rows = spark.createDataFrame(
        [(None, 0, "user", "x", None, ts(0)), ("c", -1, "user", "y", None, ts(1))],
        schema=nullable_schema,
    )
    df = turns.unionByName(bad_rows)
    good, bad = split_quarantine(df, CFG)
    assert good.count() == 5 and bad.count() == 2
    with pytest.raises(RuntimeError, match="fail_fast"):
        split_quarantine(df, CFG, mode="fail_fast")


def test_run_job_metrics(spark, turns, tmp_path):
    m = run_job(
        turns,
        CFG,
        build_fn=lambda d, c: d.withColumn("char_len", F.length("text")),
        sink_fn=lambda d: d.count(),
        quarantine_path=str(tmp_path / "quarantine"),
    )
    assert m.rows_in == 5 and m.rows_out == 5 and m.rows_quarantined == 0
    assert m.throughput_rows_per_sec > 0


def test_chronological_split(spark):
    rows = [("a", i, "user", "x", None, ts(i * 100)) for i in range(20)]
    df = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
    out = chronological_split(df, CFG, train=0.5, val=0.25)
    counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
    assert counts["train"] == 10 and counts["val"] == 5 and counts["test"] == 5
    # chronological: max train ts < min val ts < min test ts
    mx = out.groupBy("split").agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()
    bounds = {r.split: (r.lo, r.hi) for r in mx}
    assert bounds["train"][1] < bounds["val"][0] <= bounds["val"][1] < bounds["test"][0]


# --- multimodal ---------------------------------------------------------------------

def test_media_plumbing(spark):
    media = multimodal.synth_media(spark, n=30, seed=1)
    assert media.count() == 30
    feats = multimodal.extract_media_features(media)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r.features) == multimodal.FEATURE_DIM for r in rows)
    # deterministic across runs
    again = multimodal.extract_media_features(multimodal.synth_media(spark, n=30, seed=1))
    assert sorted(map(str, rows)) == sorted(map(str, again.collect()))


def test_video_frame_sampling(spark):
    media = multimodal.synth_media(spark, n=50, seed=1)
    frames = multimodal.sample_video_frames(media, every_ms=10000)
    vids = media.filter(F.col("kind") == "video").count()
    assert frames.select("media_id").distinct().count() == vids
    assert frames.count() >= vids


def test_resize_images_real(spark):
    """Nearest-neighbor resize produces valid PPMs at the target size whose
    pixel population is drawn from the source's two tones."""
    media = multimodal.synth_media_real(spark, n=12)
    resized = multimodal.resize_images(media, 6, 4)
    rows = resized.collect()
    n_images = media.filter(F.col("fmt").isin("ppm", "bmp")).count()
    assert len(rows) == n_images > 0
    from feature_extractor_mbo_lob_spark.multimodal import _decode_pixels, _ppm_params
    for r in rows:
        img = _decode_pixels("ppm", bytes(r.payload))
        assert img.shape == (4, 6, 3)
        m = r.media_id
        pa, pb = m % 256, (m * 7) % 256
        assert set(img.ravel().tolist()) <= {pa, pb}


def test_streaming_turn_rates(spark, turns):
    flusher = spark.createDataFrame(
        [("zz", 0, "user", "flush", None, ts(100000))], schema=TRANSCRIPT_SCHEMA
    )
    src = turns.unionByName(flusher)
    res = _run_stream(
        spark, src,
        lambda s: strm.streaming_turn_rates(s, CFG, window="5 minutes",
                                            slide="5 minutes", watermark="1 second"),
    )
    rows = [r for r in res.collect() if r.conv_id == "a"]
    assert rows, "windowed rates should emit for conv a"
    total = sum(r.turns for r in rows)
    assert total == 4  # every 'a' turn lands in exactly one tumbling window
    tool_total = sum(r.tool_turns for r in rows)
    assert tool_total == 1


def test_job_group_cancellation(spark):
    """A background thread cancelling the job group aborts the in-flight
    action (reference: BatchProcessor::cancel, src/batch.rs:188-230)."""
    import threading
    import time as _time

    from pyspark.sql.functions import pandas_udf

    from feature_extractor_mbo_lob_spark.batch import JobHandle

    @pandas_udf("double")
    def slow(v):
        _time.sleep(30)
        return v * 1.0

    # sum(x) forces the UDF column (count() would prune it away)
    df = spark.range(0, 64, 1, 4).select(slow("id").alias("x"))
    handle = JobHandle(spark, "cancel-test", "cancellation pytest")
    t = threading.Timer(2.0, handle.cancel)
    t.start()
    handle.activate()
    t0 = _time.time()
    with pytest.raises(Exception):
        df.agg(F.sum("x")).collect()
    handle.clear()
    t.join()
    assert handle.cancelled
    assert _time.time() - t0 < 25  # aborted well before the 30s sleep chain


def test_real_codecs_roundtrip(spark):
    """The generated WAV parses with the stdlib wave module, and decode_media
    recovers exactly the closed-form stats for all three formats."""
    import io
    import wave

    from feature_extractor_mbo_lob_spark.multimodal import (
        _encode_wav, _wav_params, decode_media, synth_media_real,
    )

    # stdlib cross-validation of the WAV container
    m = 9  # 9 % 3 == 0 -> wav
    a, b, rate, n = _wav_params(m)
    with wave.open(io.BytesIO(_encode_wav(m))) as wf:
        assert wf.getnchannels() == 1
        assert wf.getframerate() == rate
        assert wf.getnframes() == n
        assert wf.getsampwidth() == 2

    out = {r.media_id: r for r in decode_media(synth_media_real(spark, n=30)).collect()}
    assert len(out) == 30
    r = out[9]
    assert r.fmt == "wav" and r.sample_rate == rate and r.n_units == n
    assert r.val_mean == (a + b) / 2.0 and r.val_std == abs(a - b) / 2.0
    r = out[10]  # ppm
    assert r.fmt == "ppm" and r.width == 2 * (1 + 10 % 8) and r.channels == 3
    assert r.val_mean == (10 % 256 + 70 % 256) / 2.0
    r = out[11]  # bmp
    assert r.fmt == "bmp" and r.width == 4 * (1 + 11 % 6)
    assert r.n_units == r.width * r.height * 3


def test_transform_with_state_latency_resumes(spark, tmp_path):
    """transformWithState (Spark 4 stateful v2): per-conversation latency
    EWMA over TWO availableNow runs sharing one checkpoint — the RocksDB
    ValueState persists, so run 2 continues the EWMA exactly where run 1
    stopped. Output equals a python replica over the full turn sequence.

    SKIPPED where protobuf is unavailable: transformWithState's Python
    state server speaks protobuf to the JVM (pyspark requires
    google.protobuf for this one API; the rest of the engine does not)."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state-server protocol needs protobuf",
    )
    from feature_extractor_mbo_lob_spark.streaming.stream import (
        streaming_latency_state,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    rows_a = [
        ("a", 0, "user", "x", None, ts(0)),
        ("a", 1, "assistant", "y", None, ts(10)),
        ("a", 2, "user", "z", None, ts(40)),
        ("b", 0, "user", "solo", None, ts(7)),
    ]
    rows_b = [
        ("a", 3, "assistant", "w", None, ts(100)),
        ("b", 1, "assistant", "r", None, ts(9)),
    ]
    dfa = spark.createDataFrame(rows_a, schema=TRANSCRIPT_SCHEMA)
    dfb = spark.createDataFrame(rows_b, schema=TRANSCRIPT_SCHEMA)

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        def run():
            stream_in = spark.readStream.schema(dfa.schema).parquet(src)
            out = streaming_latency_state(stream_in, CFG, alpha=0.125)
            q = (
                out.writeStream.format("parquet").option("path", sink)
                .outputMode("append").option("checkpointLocation", ckpt)
                .trigger(availableNow=True).start()
            )
            q.awaitTermination(180)

        dfa.coalesce(1).write.mode("overwrite").parquet(src)
        run()
        dfb.coalesce(1).write.mode("append").parquet(src)
        run()
        got = {
            (r.conv_id, r.turn_idx): (r.turns_so_far, r.dt_us, r.ewma_dt_us)
            for r in spark.read.parquet(sink).collect()
        }
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    # python replica over the full per-conversation sequences
    seqs = {}
    for cid, ti, _, _, _, t in sorted(rows_a + rows_b, key=lambda r: (r[0], r[1])):
        seqs.setdefault(cid, []).append((ti, int(t.timestamp() * 1_000_000)))
    want = {}
    for cid, turns in seqs.items():
        last, ew = None, 0.0
        for n, (ti, us) in enumerate(turns, start=1):
            dt = 0 if last is None else max(us - last, 0)
            ew = 0.875 * ew + 0.125 * dt
            last = us
            want[(cid, ti)] = (n, dt, ew)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert got[k][1] == want[k][1], k
        assert abs(got[k][2] - want[k][2]) < 1e-6, k


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode windowed count with a 5 s watermark across TWO
    availableNow runs sharing one checkpoint: the watermark persists in the
    checkpoint, so a row arriving in run 2 that is far behind it must be
    dropped — the finalized [0,10) window is emitted exactly once with only
    the on-time rows."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    rows_a = [
        ("a", 0, "user", "x", None, ts(0)),
        ("a", 1, "user", "y", None, ts(5)),
        ("a", 2, "user", "flush1", None, ts(10_000)),
    ]
    rows_b = [
        ("a", 3, "user", "LATE", None, ts(2)),         # behind watermark
        ("a", 4, "user", "flush2", None, ts(20_000)),
    ]
    dfa = spark.createDataFrame(rows_a, schema=TRANSCRIPT_SCHEMA)
    dfb = spark.createDataFrame(rows_b, schema=TRANSCRIPT_SCHEMA)

    sink = str(tmp_path / "sink")

    def run():
        stream_in = spark.readStream.schema(dfa.schema).parquet(src)
        out = (
            stream_in.withWatermark("ts", "5 seconds")
            .groupBy(F.window("ts", "10 seconds").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            out.writeStream.format("parquet").option("path", sink)
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        return [(r.w.start, r.n) for r in spark.read.parquet(sink).collect()]

    dfa.coalesce(1).write.mode("overwrite").parquet(src)
    run()
    dfb.coalesce(1).write.mode("append").parquet(src)
    emitted = run()          # cumulative: file sink appends across both runs

    zero_win = [n for (start, n) in emitted if start == ts(0)]
    # the on-time window is emitted exactly once, with ONLY the 2 on-time
    # rows — the checkpointed watermark dropped the late row in run 2, so it
    # neither re-opened nor inflated the finalized window
    assert zero_win == [2], emitted
    # flush1's window finalizes once run 2 advances the watermark past it
    assert emitted.count((ts(10_000), 1)) == 1, emitted


def test_repartition_by_bytes_isolates_giants(spark):
    from pyspark.sql import functions as F

    from feature_extractor_mbo_lob_spark import multimodal

    rows = [(i, bytes(100)) for i in range(400)] + [(999, bytes(200_000))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = multimodal.repartition_by_bytes(df, target_bytes=10_000, isolate_top=1)
    per = (
        out.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.sum(F.octet_length("payload")).alias("bytes"),
             F.max("media_id").alias("mx"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    giant = [r for r in per if r.mx == 999]
    assert len(giant) == 1 and giant[0].n == 1   # the giant rides alone
    others = [r.bytes for r in per if r.mx != 999]
    # regular buckets hold the hashed mass: 40KB over ceil(40KB/10KB)=4 buckets
    assert others and max(others) < 25_000


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark over TWO availableNow runs sharing a
    checkpoint: in-batch duplicates collapse, and a retransmission of an
    already-seen turn in run 2 (still within the watermark) is dropped,
    while a genuine edit (same key, different text) passes through."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    rows_a = [
        ("a", 0, "user", "x", None, ts(0)),
        ("a", 0, "user", "x", None, ts(0)),      # in-batch duplicate
        ("a", 1, "assistant", "y", None, ts(10)),
    ]
    rows_b = [
        ("a", 0, "user", "x", None, ts(0)),      # retransmission -> dropped
        ("a", 1, "assistant", "y EDITED", None, ts(10)),  # edit -> kept
        ("a", 2, "user", "z", None, ts(20)),
    ]
    dfa = spark.createDataFrame(rows_a, schema=TRANSCRIPT_SCHEMA)
    dfb = spark.createDataFrame(rows_b, schema=TRANSCRIPT_SCHEMA)

    def run():
        stream_in = spark.readStream.schema(dfa.schema).parquet(src)
        out = strm.streaming_dedup(stream_in, CFG, watermark="1 hour")
        q = (
            out.writeStream.format("parquet").option("path", sink)
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    dfa.coalesce(1).write.mode("overwrite").parquet(src)
    run()
    dfb.coalesce(1).write.mode("append").parquet(src)
    run()

    got = sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in spark.read.parquet(sink).collect()
    )
    assert got == [
        ("a", 0, "x"),
        ("a", 1, "y"),
        ("a", 1, "y EDITED"),
        ("a", 2, "z"),
    ]


def test_stream_stream_interval_join(spark, tmp_path):
    """Stream-stream tool pairing: inner interval join with watermarks on
    both streams — results within the wait window pair up, results outside
    it (or for other tools) don't."""
    src_i = str(tmp_path / "invokes")
    src_r = str(tmp_path / "results")

    invokes = spark.createDataFrame(
        [
            ("a", 1, "assistant", "call", "t1", ts(0)),
            ("a", 3, "assistant", "call", "t2", ts(100)),
            ("b", 0, "assistant", "call", "t1", ts(50)),
        ],
        schema=TRANSCRIPT_SCHEMA,
    )
    results = spark.createDataFrame(
        [
            ("a", 2, "tool", "ok", "t1", ts(30)),      # pairs with a/t1@0
            ("a", 4, "tool", "ok", "t2", ts(800)),     # outside 600 s wait
            ("b", 1, "tool", "ok", "t1", ts(55)),      # pairs with b/t1@50
            ("b", 2, "tool", "ok", "t9", ts(60)),      # tool mismatch
        ],
        schema=TRANSCRIPT_SCHEMA,
    )
    invokes.coalesce(1).write.mode("overwrite").parquet(src_i)
    results.coalesce(1).write.mode("overwrite").parquet(src_r)

    si = spark.readStream.schema(invokes.schema).parquet(src_i)
    sr = spark.readStream.schema(results.schema).parquet(src_r)
    out = strm.streaming_tool_pairing(si, sr, CFG, max_wait_s=600)

    import uuid
    name = "ssj" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.conv_id, r.tool, r.latency_us) for r in spark.table(name).collect()
    )
    assert got == [("a", "t1", 30_000_000), ("b", "t1", 5_000_000)]


def test_compact_parquet_targets_file_count(spark, tmp_path):
    from feature_extractor_mbo_lob_spark.export import compact_parquet

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    rows = [("c%d" % (i % 50), i, "user", "word " * 20, None, ts(i)) for i in range(5000)]
    df = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
    df.repartition(64).write.mode("overwrite").parquet(src)  # 64 tiny files

    import pathlib
    n_src = len(list(pathlib.Path(src).glob("*.parquet")))
    assert n_src >= 32

    total = sum(p.stat().st_size for p in pathlib.Path(src).rglob("*.parquet"))
    n_req = compact_parquet(spark, src, dst, target_file_bytes=total // 4 + 1,
                            sort_cols=["conv_id", "turn_idx"])
    n_dst = len(list(pathlib.Path(dst).glob("*.parquet")))
    assert n_req == 4
    assert n_dst <= 5  # repartitionByRange may leave an empty slice unwritten
    back = spark.read.parquet(dst)
    assert back.count() == 5000
    # clustering restored: conv_id min/max spans are narrow per file
    from feature_extractor_mbo_lob_spark.operators.layout import file_span_stats
    spans = file_span_stats(dst, "conv_id")
    assert all(lo <= hi for lo, hi in spans) and len(spans) >= n_dst


def test_audio_spectral_features_match_numpy(spark):
    """Spectral features equal a direct numpy computation over the same
    decoded PCM; non-wav rows pass through with NULLs."""
    import numpy as np

    from feature_extractor_mbo_lob_spark.multimodal import (
        _pcm16_samples, audio_spectral_features, synth_media_real,
    )

    media = synth_media_real(spark, n=9)
    rows = {r.media_id: r for r in audio_spectral_features(media).collect()}
    src = {r.media_id: (r.fmt, bytes(r.payload)) for r in media.collect()}
    assert set(rows) == set(src)
    n_wav = 0
    for mid, (fmt, pl) in src.items():
        got = rows[mid]
        if fmt != "wav":
            assert got.rms is None and got.spectral_centroid_hz is None
            continue
        n_wav += 1
        x, rate = _pcm16_samples(pl)
        assert abs(got.rms - float(np.sqrt(np.mean(x * x)))) < 1e-9
        mag = np.abs(np.fft.rfft(x))
        freqs = np.fft.rfftfreq(len(x), d=1.0 / rate)
        want_c = float((freqs * mag).sum() / mag.sum())
        assert abs(got.spectral_centroid_hz - want_c) < 1e-6
        assert 0.0 <= got.zcr <= 1.0
        assert got.rolloff_hz >= 0.0
    assert n_wav >= 2


def test_image_dhash_similarity_and_stability(spark):
    """dHash: identical images hash identically; a lightly-perturbed image
    stays within a few Hamming bits; a different image is far."""
    import numpy as np

    from feature_extractor_mbo_lob_spark.multimodal import (
        _encode_ppm_pixels, image_dhash,
    )

    rng = np.random.RandomState(5)
    base = rng.randint(0, 255, size=(32, 32, 3)).astype(np.uint8)
    near = base.copy()
    near[:2, :2] = 255 - near[:2, :2]          # tiny local edit
    far = rng.randint(0, 255, size=(32, 32, 3)).astype(np.uint8)

    rows = [
        (0, "ppm", bytearray(_encode_ppm_pixels(base))),
        (1, "ppm", bytearray(_encode_ppm_pixels(base))),
        (2, "ppm", bytearray(_encode_ppm_pixels(near))),
        (3, "ppm", bytearray(_encode_ppm_pixels(far))),
        (4, "wav", bytearray(b"RIFF")),
    ]
    df = spark.createDataFrame(rows, "media_id: long, fmt: string, payload: binary")
    got = {r.media_id: r.dhash for r in image_dhash(df).collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert got[0] == got[1]
    assert ham(got[0], got[2]) <= 8
    assert ham(got[0], got[3]) >= 16
    assert got[4] is None


def test_phash_bands_wav_closed_form():
    import numpy as np

    from feature_extractor_mbo_lob_spark import multimodal as mm

    # wav media 3: a = -97 < b = -79 -> first 32 grid samples below the
    # mean (bits 0), last 32 above (bits 1)
    bands = mm._phash_bands("wav", mm._encode_wav(3))
    assert bands == [0, 0, 65535, 65535]
    # media 0 has a == b == -100: flat waveform -> all bits zero
    assert mm._phash_bands("wav", mm._encode_wav(0)) == [0, 0, 0, 0]


def test_phash_bands_image_matches_naive():
    import numpy as np

    from feature_extractor_mbo_lob_spark import multimodal as mm

    for m in (1, 2, 4, 5, 7, 8, 100, 101):
        fmt = {1: "ppm", 2: "bmp"}[m % 3] if m % 3 else None
        if fmt is None:
            continue
        payload = (mm._encode_ppm if fmt == "ppm" else mm._encode_bmp)(m)
        img = mm._decode_pixels(fmt, payload).astype(np.int64)
        gray = img.sum(axis=2) // 3
        h, w = gray.shape
        vals = [gray[(gy * h) // 8][(gx * w) // 8] for gy in range(8) for gx in range(8)]
        mean = sum(int(v) for v in vals) // 64
        bits = [1 if v > mean else 0 for v in vals]
        expect = [
            sum(bits[b * 16 + i] << i for i in range(16)) for b in range(4)
        ]
        assert mm._phash_bands(fmt, payload) == expect, m


def test_phash_near_dup_exact_zero_distance(spark):
    from feature_extractor_mbo_lob_spark import multimodal as mm

    media = mm.synth_media_real(spark, n=60)
    fp = mm.phash_fingerprints(media)
    out = mm.phash_near_dup(fp, max_hamming=0).collect()
    # zero-distance pairs must have identical band vectors
    by_id = {r["media_id"]: r for r in fp.collect()}
    assert out, "two-tone synthetic media must contain exact phash dups"
    for r in out:
        a, b = by_id[r["id_a"]], by_id[r["id_b"]]
        assert a["fmt"] == b["fmt"] == r["fmt"]
        assert all(a[f"band{i}"] == b[f"band{i}"] for i in range(4))
        assert r["hamming"] == 0


def test_phash_near_dup_band_bucket_cap(spark):
    from feature_extractor_mbo_lob_spark import multimodal as mm

    media = mm.synth_media_real(spark, n=60)
    fp = mm.phash_fingerprints(media)
    # a cap of 1 drops every shared band bucket -> no candidates at all
    assert mm.phash_near_dup(fp, max_hamming=64, max_band_bucket=1).count() == 0


def test_streaming_page_hinkley_cross_batch_state(spark, tmp_path):
    """Two files + maxFilesPerTrigger=1 force TWO micro-batches: the PH
    trajectory must carry (n, cumsum, m, min m) across the batch
    boundary and the final emitted row must equal the single-pass
    integer mirror over the full ordered series."""
    import datetime
    import uuid

    import pandas as pd

    from feature_extractor_mbo_lob_spark.streaming.stream import (
        streaming_page_hinkley,
    )

    base = datetime.datetime(2024, 1, 1)
    xs = [10, 10, 10, 10, 50, 50, 50, 50]  # level shift mid-series
    rows = [
        ("a", x, base + datetime.timedelta(minutes=i), i)
        for i, x in enumerate(xs)
    ]
    df = spark.createDataFrame(
        rows, "event_type string, v long, ts timestamp, event_id long"
    )
    src_dir = str(tmp_path / "ph_src")
    # file 0 = first half, file 1 = second half (lexicographic order ==
    # arrival order for availableNow's file listing)
    df.filter("event_id < 4").coalesce(1).write.parquet(src_dir + "/p=0")
    df.filter("event_id >= 4").coalesce(1).write.parquet(src_dir + "/p=1")
    src = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir + "/p=*")
    )
    out = streaming_page_hinkley(src, key_col="event_type", value_col="v")
    qname = "ph_" + uuid.uuid4().hex[:10]
    q = (
        out.writeStream.format("memory").queryName(qname)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination()
    res = spark.table(qname).toPandas().sort_values("n")
    # one emitted row per micro-batch that saw data; final row is last
    final = res.iloc[-1]

    # integer mirror over the whole ordered series
    n = s = m = 0
    mmin = None
    for x in xs:
        n += 1
        s += x
        m += x - s // n
        mmin = m if mmin is None else min(mmin, m)
    assert int(final["n"]) == 8
    assert int(final["m_t"]) == m
    assert int(final["ph_t"]) == m - mmin
    assert int(final["ph_t"]) > 0  # the level shift raised the statistic
    # the intermediate batch emission matches the 4-element prefix
    if len(res) > 1:
        n = s = m = 0
        mmin = None
        for x in xs[:4]:
            n += 1
            s += x
            m += x - s // n
            mmin = m if mmin is None else min(mmin, m)
        first = res.iloc[0]
        assert int(first["n"]) == 4 and int(first["m_t"]) == m
