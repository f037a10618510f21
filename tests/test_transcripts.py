"""Source determinism + the per-turn text-identity invariant
(BASELINE input_hint: per-turn text equality under stable turn ordering)."""

from feature_extractor_mbo_lob_spark.sources import TRANSCRIPT_SCHEMA, synth_transcripts


def rows_sorted(df):
    return sorted(
        df.select("conv_id", "turn_idx", "role", "text", "tool", "ts").collect(),
        key=lambda r: (r.conv_id, r.turn_idx),
    )


def test_schema(transcripts):
    got = {f.name: f.dataType.simpleString() for f in transcripts.schema.fields}
    want = {f.name: f.dataType.simpleString() for f in TRANSCRIPT_SCHEMA.fields}
    assert got == want


def test_deterministic_across_runs_and_partitionings(spark, transcripts):
    again = synth_transcripts(spark, n_convs=25, min_turns=5, max_turns=40, seed=42)
    assert rows_sorted(transcripts) == rows_sorted(again)
    # independence from physical layout
    shuffled = again.repartition(13)
    assert rows_sorted(transcripts) == rows_sorted(shuffled)


def test_seed_changes_output(spark, transcripts):
    other = synth_transcripts(spark, n_convs=25, min_turns=5, max_turns=40, seed=7)
    assert rows_sorted(transcripts) != rows_sorted(other)


def test_turn_zero_is_user_and_ts_monotone(transcripts):
    rows = rows_sorted(transcripts)
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r.conv_id, []).append(r)
    for conv, turns in by_conv.items():
        assert turns[0].role == "user"
        idxs = [t.turn_idx for t in turns]
        assert idxs == list(range(len(turns)))
        tss = [t.ts for t in turns]
        assert tss == sorted(tss)


def test_mega_convs_add_skew(spark):
    df = synth_transcripts(spark, n_convs=5, n_mega_convs=1, mega_turns=500, seed=1)
    counts = {r.conv_id: r["cnt"] for r in df.groupBy("conv_id").count().withColumnRenamed("count", "cnt").collect()}
    assert counts["c5"] == 500


def test_read_jsonl_quarantines_corrupt_lines(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from feature_extractor_mbo_lob_spark.sources import read_jsonl

    p = tmp_path / "corpus.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world"}\n'
        '{"doc_id": 2, "text": "fine"}\n'
        'this line is not json at all\n'
        '{"doc_id": 3, "text": "trailing ok"}\n'
        '{"doc_id": 4, "text": truncated...\n'
    )
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ])
    good, bad = read_jsonl(spark, str(p), schema)
    assert sorted(r.doc_id for r in good.collect()) == [1, 2, 3]
    raws = [r.raw_line for r in bad.collect()]
    assert len(raws) == 2
    assert any("not json" in r for r in raws)
    assert good.columns == ["doc_id", "text"]


def test_schema_evolution_merge_read(spark, tmp_path):
    """Corpus dumps drift: a later shard adds a column. mergeSchema reads
    the union schema with NULLs for the old shard — the engine's ingest
    contract for evolving corpora (explicit, never silent retyping)."""
    p = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id: long, text: string")
    v1.write.mode("overwrite").parquet(p + "/batch=1")
    v2 = spark.createDataFrame(
        [(3, "c", "en")], "doc_id: long, text: string, lang: string"
    )
    v2.write.mode("overwrite").parquet(p + "/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"doc_id", "text", "lang", "batch"}
    rows = {r.doc_id: r.lang for r in merged.collect()}
    assert rows == {1: None, 2: None, 3: "en"}
