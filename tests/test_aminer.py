"""AMiner tagged-text codec tests (SURVEY.md §2.1 S1, §1.4)."""

from pyspark_entity_resolution_spark.sources.aminer import (
    format_aminer_record,
    read_aminer,
)


def test_roundtrip_basic(spark, tmp_path):
    recs = [
        format_aminer_record(
            "Efficient Query Processing",
            "Alice Smith, Bob Jones",
            1999,
            "SIGMOD Conference",
            "idx001",
        ),
        format_aminer_record(
            "Streaming Joins", "Carol Chen", 2001, "VLDB", "idx002",
            references=["ref1", "ref2", "ref3"],
        ),
        format_aminer_record("No Authors Here", "", 2000, "VLDB Journal", "idx003"),
    ]
    path = tmp_path / "dump.txt"
    path.write_text("\n\n".join(recs))

    rows = {r["index"]: r for r in read_aminer(spark, str(path)).collect()}
    assert len(rows) == 3

    r1 = rows["idx001"]
    # extraction happens on the lowercased record
    assert r1["title"] == "efficient query processing"
    assert r1["authors"] == "alice smith, bob jones"
    assert r1["year"] == 1999
    assert r1["venue"] == "sigmod conference"
    # value keeps the raw block
    assert "Efficient Query Processing" in r1["value"]

    r2 = rows["idx002"]
    assert r2["references"] == "ref1, ref2, ref3"
    assert r2["year"] == 2001

    r3 = rows["idx003"]
    assert r3["authors"] == ""
    assert r3["references"] is None


def test_missing_fields_are_null(spark, tmp_path):
    path = tmp_path / "dump.txt"
    path.write_text("#*title only\n#index idx009")
    row = read_aminer(spark, str(path)).collect()[0]
    assert row["title"] == "title only"
    assert row["authors"] is None
    assert row["year"] is None
    assert row["venue"] is None
