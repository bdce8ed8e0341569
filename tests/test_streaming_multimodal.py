"""Streaming front-end + multimodal plumbing."""

import math

import pytest

from extract_address_ner_spark.operators import multimodal as MM
from extract_address_ner_spark.operators.tagger import extract_mentions
from extract_address_ner_spark.sources import corpus as C
from extract_address_ner_spark.streaming import stream as S


def test_stream_equals_batch(spark, tmp_path, sf_smoke):
    """The same extraction plan over a file-source stream produces exactly
    the batch result (exactly-once drain with availableNow)."""
    corpus = C.corpus_from_documents(spark, sf_smoke)
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    corpus.write.parquet(in_dir)

    stream = S.read_corpus_stream(spark, in_dir)
    assert stream.isStreaming
    S.run_stream_to_parquet(S.stream_extract_mentions(stream), out_dir, ckpt)

    got = {
        (r["doc_id"], r["mention_text"], r["m_start"], r["m_end"])
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        (r["doc_id"], r["mention_text"], r["m_start"], r["m_end"])
        for r in extract_mentions(corpus).collect()
    }
    assert got == want

    # resume with no new files → no new rows (exactly-once)
    stream2 = S.read_corpus_stream(spark, in_dir)
    S.run_stream_to_parquet(S.stream_extract_mentions(stream2), out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == len(want)


def test_stream_dedup_exact(spark, tmp_path):
    """Exact dedup on arrival: duplicates inside the watermark window are
    dropped; one row per distinct content survives."""
    in_dir = str(tmp_path / "dedup_in")
    rows = [
        ("r1", "a.py", "hello world", "2026-01-01 00:00:00"),
        ("r1", "b.py", "hello world", "2026-01-01 00:01:00"),  # dup content
        ("r2", "c.py", "unique text", "2026-01-01 00:02:00"),
        ("r2", "d.py", "hello world", "2026-01-01 00:03:00"),  # dup content
        ("r3", "e.py", "another doc", "2026-01-01 00:04:00"),
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, content string, ts string"
    )
    df.write.parquet(in_dir)
    stream = spark.readStream.schema(
        "repo string, path string, content string, ts string"
    ).parquet(in_dir)
    deduped = S.stream_dedup_exact(stream, ts_col="ts", text_col="content")
    assert deduped.isStreaming
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select * from dedup_out").collect()
    contents = sorted(r["content"] for r in got)
    assert contents == ["another doc", "hello world", "unique text"]
    assert all(len(r["content_sha256"]) == 64 for r in got)


def test_streaming_windowed_counts(spark, tmp_path, sf_smoke):
    # file-source streaming requires a directory of files
    ev_dir = str(tmp_path / "events")
    spark.read.parquet(f"{sf_smoke}/events.parquet").write.parquet(ev_dir)
    ev_stream = spark.readStream.schema(
        S.events_schema(spark, f"{sf_smoke}/events.parquet")
    ).parquet(ev_dir)
    agg = S.windowed_event_counts(ev_stream, window="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select * from win_counts").collect()
    # append mode emits only watermark-closed windows; compare against batch
    batch = (
        S.windowed_event_counts(
            spark.read.parquet(f"{sf_smoke}/events.parquet"), window="1 hour"
        )
        .collect()
    )
    bmap = {(r["win_start"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in batch}
    assert len(got) > 0
    for r in got:
        k = (r["win_start"], r["event_type"])
        assert bmap[k][0] == r["n_events"]
        assert math.isclose(bmap[k][1], r["sum_value"], rel_tol=1e-9)


def test_multimodal_plumbing(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    media = MM.synth_media(docs)
    rows = media.limit(5).collect()
    for r in rows:
        assert r["media_type"] in MM.MEDIA_TYPES
        assert 64 <= r["width"] < 64 + 1024
        assert isinstance(r["payload"], (bytes, bytearray))

    feats = MM.extract_media_features(media).collect()
    assert len(feats) == docs.count()
    for r in feats[:10]:
        v = r["feature"]
        assert len(v) == MM.ByteHistogramDecoder.N_BINS
        assert abs(sum(v) - 1.0) < 1e-9  # normalized histogram

    # deterministic across runs
    feats2 = MM.extract_media_features(media).collect()
    assert {(r["doc_id"], tuple(r["feature"])) for r in feats} == {
        (r["doc_id"], tuple(r["feature"])) for r in feats2
    }


def test_multimodal_frame_sampling_and_resize(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    media = MM.synth_media(docs)
    frames = MM.sample_frames(media, every_n=30).collect()
    assert len(frames) > 0
    for r in frames:
        assert r["frame_indices"][0] == 0
        assert all(i < r["n_frames"] for i in r["frame_indices"])
        assert r["n_sampled"] == len(r["frame_indices"])
        assert r["n_sampled"] == math.ceil(r["n_frames"] / 30)

    resized = MM.resize_plan(media, max_side=256).collect()
    for r in resized:
        assert max(r["new_width"], r["new_height"]) <= 256
        if max(r["width"], r["height"]) <= 256:
            assert (r["new_width"], r["new_height"]) == (r["width"], r["height"])
        else:
            # aspect ratio preserved within integer floor tolerance
            ar_old = r["width"] / r["height"]
            ar_new = r["new_width"] / max(r["new_height"], 1)
            assert abs(ar_old - ar_new) / ar_old < 0.1


def test_library_decoder_gated():
    with pytest.raises(NotImplementedError):
        MM.LibraryDecoder()
