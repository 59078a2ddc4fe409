"""chunk_documents and semantic_dedup semantics."""

from pyspark.sql import functions as F


def _chunks(spark, text, chunk_size=8, overlap=3):
    from pdcm_etl_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    return (
        chunk_documents(df, chunk_size=chunk_size, overlap=overlap)
        .orderBy("chunk_index")
        .collect()
    )


def test_short_doc_single_chunk(spark):
    rows = _chunks(spark, "a b c")
    assert len(rows) == 1
    assert rows[0]["chunk_text"] == "a b c"
    assert rows[0]["chunk_tokens"] == 3
    assert rows[0]["chunk_index"] == 0


def test_chunks_cover_document_with_overlap(spark):
    words = [f"w{i}" for i in range(20)]
    rows = _chunks(spark, " ".join(words), chunk_size=8, overlap=3)
    # stride 5: starts 1, 6, 11, 16 (1-based) -> 4 chunks
    assert [r["chunk_index"] for r in rows] == [0, 1, 2, 3]
    texts = [r["chunk_text"].split(" ") for r in rows]
    # full coverage in order
    reconstructed = texts[0] + [t for c in texts[1:] for t in c[3:]]
    assert reconstructed == words
    # consecutive chunks share exactly `overlap` tokens
    for a, b in zip(texts, texts[1:]):
        assert a[-3:] == b[:3]
    # last chunk truncated at the document end
    assert rows[-1]["chunk_tokens"] == len(texts[-1])


def test_chunk_rejects_bad_overlap(spark):
    import pytest

    from pdcm_etl_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=4, overlap=4)


def test_semantic_dedup_removes_exactly_smaller_id_neighbors(spark):
    """removed(v) <=> v has a smaller-id same-cluster neighbor >= tau —
    cross-checked against the in-cluster brute force."""
    from pdcm_etl_spark.operators.similarity import (
        embedding_near_dup_pairs,
        kmeans_assign,
        semantic_dedup,
    )

    vecs = [
        (i, [float((i * 7 + j * 3) % 5) - 2.0 for j in range(8)])
        for i in range(40)
    ]
    # plant a near-duplicate pair
    vecs[25] = (25, [v + 0.01 for v in vecs[24][1]])
    emb = spark.createDataFrame(vecs, ["vec_id", "embedding"])

    out = semantic_dedup(emb, k=3, iterations=1, min_ppm=990000)
    assigned = kmeans_assign(emb, k=3, iterations=1)
    labeled = emb.join(assigned, "vec_id")
    pairs = embedding_near_dup_pairs(
        labeled, block_col="cid", min_ppm=990000
    )
    expect_removed = {r["id_b"] for r in pairs.collect()}
    got_removed = {r["vec_id"] for r in out.collect() if r["removed"]}
    assert got_removed == expect_removed
    assert 25 in got_removed  # the planted duplicate goes
    assert out.count() == 40
