"""Sink tests: array→'{..}' flattening, null→'', newline escaping, and a
round-trip TSV write/read."""

import glob

from pyspark.sql import functions as F

from pdcm_etl_spark.sources import sinks


def test_flatten_and_nulls(spark):
    df = spark.createDataFrame(
        [
            (1, ["a", "b"], [1, 2], "ok"),
            (2, [], None, None),
            (3, None, [7], "line1\nline2"),
        ],
        "id long, tags array<string>, nums array<int>, note string",
    )
    out = sinks.to_export_frame(df)
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["tags"] == '{"a","b"}'
    assert rows[1]["nums"] == "{1,2}"
    assert rows[2]["tags"] == ""      # empty array → null → ''
    assert rows[2]["note"] == ""
    assert rows[3]["note"] == "line1\\nline2"


def test_tsv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, ["x"], "hello"), (2, None, "a\nb")],
        "id long, tags array<string>, note string",
    )
    path = str(tmp_path / "out")
    sinks.write_tsv(df, path)
    files = glob.glob(path + "/*.csv")
    assert files
    text = "".join(open(f).read() for f in sorted(files))
    assert 'id\ttags\tnote' in text
    assert '{"x"}' in text
    assert "a\\nb" in text


def test_parquet_partitioned_by_provider(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "TRACE"), (2, "PDMR")], "id long, data_source_tmp string"
    )
    path = str(tmp_path / "lake")
    sinks.write_entity_parquet(df, path)
    parts = {p.split("=")[-1].split("/")[0] for p in glob.glob(path + "/data_source_tmp=*")}
    assert parts == {"TRACE", "PDMR"}
    back = spark.read.parquet(path)
    assert back.count() == 2


def test_jdbc_round_trip(spark, tmp_path):
    """DB load path (SURVEY §2.2 Postgres COPY row): write an entity via
    df.write.jdbc into an embedded Derby database and read it back —
    values survive the export normalization + JDBC type mapping."""
    from pyspark.sql import functions as F

    from pdcm_etl_spark.sources import sinks

    df = spark.createDataFrame(
        [(1, "model A", ["x", "y"]), (2, "line\nbreak", []), (3, None, None)],
        "id bigint, name string, tags array<string>",
    )
    url = f"jdbc:derby:{tmp_path}/testdb;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    sinks.write_jdbc(df, url, "entity_rt", driver=driver)
    back = sinks.read_jdbc(spark, url, "entity_rt", driver=driver)
    rows = {r["ID"] if "ID" in r.__fields__ else r["id"]: r for r in back.collect()}
    assert len(rows) == 3
    get = lambda r, c: r[c] if c in r.__fields__ else r[c.upper()]
    assert get(rows[1], "name") == "model A"
    assert get(rows[1], "tags") == '{"x","y"}'
    assert get(rows[2], "name") == "line\\nbreak"
    # null/empty normalization: null name -> '', empty array -> null -> ''
    assert get(rows[3], "name") == ""
