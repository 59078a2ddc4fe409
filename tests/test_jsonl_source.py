"""JSONL quarantine source + partitioned corpus writer."""

import glob
import os

from pyspark.sql import functions as F


def test_jsonl_quarantine(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "url": "http://a", "lang": "en", "text": "hello world"}\n'
        'THIS IS NOT JSON\n'
        '{"doc_id": 2, "url": "http://b", "lang": "de", "text": "hallo welt"}\n'
        '{"doc_id": 3, "lang": "en"}\n'            # missing fields -> nulls, clean
        '{"doc_id": "not-a-number", "lang": "en"}\n'  # type mismatch -> corrupt
    )
    from pdcm_etl_spark.sources.jsonl import read_jsonl, split_corrupt

    clean, quarantine = split_corrupt(read_jsonl(spark, str(p)))
    got = {r["doc_id"] for r in clean.collect()}
    assert got == {1, 2, 3}
    bad = [r["_corrupt_record"] for r in quarantine.collect()]
    assert len(bad) == 2
    assert "THIS IS NOT JSON" in bad[0] or "THIS IS NOT JSON" in bad[1]


def test_corpus_partitioned_layout(spark, tmp_path):
    from pdcm_etl_spark.sources.jsonl import write_corpus_partitioned

    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
        F.concat(F.lit("text "), "id").alias("text"),
    )
    out = str(tmp_path / "corpus")
    write_corpus_partitioned(df, out, partition_col="lang", sort_col="doc_id")
    # hive partition dirs exist
    assert os.path.isdir(os.path.join(out, "lang=en"))
    assert os.path.isdir(os.path.join(out, "lang=de"))
    back = spark.read.parquet(out)
    assert back.count() == 200
    # partition pruning: reading one partition touches only its files
    en = back.filter(F.col("lang") == "en")
    assert en.count() == 100
    # within-file ordering on the sort key (row-group pruning precondition)
    for f in glob.glob(os.path.join(out, "lang=*", "*.parquet")):
        ids = [r["doc_id"] for r in spark.read.parquet(f).select("doc_id").collect()]
        assert ids == sorted(ids)
