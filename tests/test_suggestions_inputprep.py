"""S11 suggestions store + P2/P4 input-prep filters."""


def test_fetch_suggestions_ilike(spark):
    from nadry_spark.operators.suggestions import fetch_suggestions

    sugg = spark.createDataFrame(
        [("Sports News",), ("sporting goods",), ("weather",), ("SPORT",)],
        "suggestion string",
    )
    got = [r["suggestion"] for r in fetch_suggestions(sugg, "sport", limit=10).collect()]
    assert got == ["SPORT", "Sports News", "sporting goods"]
    assert fetch_suggestions(sugg, "zzz").collect() == []
    # limit applies
    assert len(fetch_suggestions(sugg, "sport", limit=2).collect()) == 2


def test_insert_suggestion_dedup(spark):
    from nadry_spark.operators.suggestions import insert_suggestion

    sugg = spark.createDataFrame([("alpha",), ("Beta",)], "suggestion string")
    s2 = insert_suggestion(sugg, "BETA")  # 409 path: case-insensitive dup
    assert s2.count() == 2
    s3 = insert_suggestion(sugg, "gamma")
    assert sorted(r["suggestion"] for r in s3.collect()) == ["Beta", "alpha", "gamma"]


def test_filter_blocked_domains(spark):
    from nadry_spark.sources.pages import filter_blocked_domains

    pages = spark.createDataFrame(
        [
            ("https://en.wikipedia.org/wiki/Spark",),
            ("https://site1.example.com/p/1",),
        ],
        "url string",
    )
    got = [r["url"] for r in filter_blocked_domains(pages).collect()]
    assert got == ["https://site1.example.com/p/1"]


def test_dedup_input_pages_earliest_wins(spark):
    import datetime as dt

    from nadry_spark.sources.pages import dedup_input_pages

    t0 = dt.datetime(2025, 1, 1)
    pages = spark.createDataFrame(
        [
            ("u1", t0, "old"),
            ("u1", t0 + dt.timedelta(days=1), "new"),
            ("u2", t0, "only"),
        ],
        "url string, warc_ts timestamp, text string",
    )
    got = {r["url"]: r["text"] for r in dedup_input_pages(pages).collect()}
    assert got == {"u1": "old", "u2": "only"}
