"""applyInPandasWithState: running totals persist across stream restarts."""

from extract_address_ner_spark.sources import corpus as C
from extract_address_ner_spark.streaming import stream as S
from extract_address_ner_spark.streaming.stateful import running_repo_totals


def test_running_totals_across_batches(spark, tmp_path, sf_smoke):
    corpus = C.corpus_from_documents(spark, sf_smoke)
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    half1 = corpus.filter("doc_id % 2 = 0")
    half2 = corpus.filter("doc_id % 2 = 1")
    half1.write.mode("append").parquet(in_dir)

    def drain(qname):
        # memory sink cannot recover a checkpoint — foreachBatch can
        rows = []
        stream = S.read_corpus_stream(spark, in_dir)
        totals = running_repo_totals(S.stream_extract_mentions(stream))
        q = (
            totals.writeStream.foreachBatch(
                lambda df, _bid: rows.extend(df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r["repo"]: r for r in rows}

    t1 = drain("totals1")
    assert t1 and all(r["total_mentions"] == r["batch_mentions"] for r in t1.values())

    # second file drop: state must carry over the restart (checkpointed)
    half2.write.mode("append").parquet(in_dir)
    t2 = drain("totals2")
    from extract_address_ner_spark.operators.tagger import extract_mentions

    want = {
        r["repo"]: r["n"]
        for r in extract_mentions(corpus).groupBy("repo").count()
        .withColumnRenamed("count", "n").collect()
    }
    got = {repo: r["total_mentions"] for repo, r in t2.items()}
    assert got == want
    assert all(r["updates"] == 2 for r in t2.values())

    # the state above must have lived in RocksDB, not on the executor heap
    # (VERDICT r04 #3): the session conf is pinned by the stream helpers and
    # the checkpoint's state directory carries RocksDB snapshot/changelog
    # artifacts instead of the HDFS-backed provider's .delta files.
    assert (
        spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        == S.ROCKSDB_PROVIDER
    )
    import glob

    state_glob = f"{ckpt}/state/**/*"
    files = glob.glob(state_glob, recursive=True)
    assert any(f.endswith((".zip", ".changelog")) for f in files), files
    assert not any(f.endswith(".delta") for f in files), files
