"""AMiner codec robustness: malformed, partial, and messy records must
parse to NULLs/best-effort values, never crash (Spark 4 ANSI mode makes
this non-trivial: naive getItem would error)."""

from pyspark_entity_resolution_spark.sources.aminer import read_aminer


def test_malformed_records_do_not_crash(spark, tmp_path):
    blocks = [
        "",                                     # empty record
        "garbage without any tags",
        "#*Title Only",
        "#@Only Authors Here",
        "#tnot_a_year\n#cSomewhere",            # unparseable year -> NULL
        "#*Ok Title\n#@A, B\n#t1999\n#cVLDB\n#indexg001",
        "#index\n#t2001",                       # empty index value
        "#*Tabs\tand odd spaces\n#t2000\n#indexg002",
    ]
    path = tmp_path / "messy.txt"
    path.write_text("\n\n".join(blocks))
    rows = read_aminer(spark, str(path)).collect()
    assert len(rows) == len(blocks)

    by_value = {r["value"]: r for r in rows}
    assert by_value["garbage without any tags"]["title"] is None
    assert by_value["#*Title Only"]["title"] == "title only"
    assert by_value["#tnot_a_year\n#cSomewhere"]["year"] is None
    ok = by_value["#*Ok Title\n#@A, B\n#t1999\n#cVLDB\n#indexg001"]
    assert ok["year"] == 1999 and ok["authors"] == "a, b"


def test_crlf_and_trailing_blank_lines(spark, tmp_path):
    text = "#*One\n#t1999\n\n#*Two\n#t2000\n\n"
    path = tmp_path / "trail.txt"
    path.write_text(text)
    rows = read_aminer(spark, str(path)).collect()
    titles = {r["title"] for r in rows if r["title"]}
    assert titles == {"one", "two"}
