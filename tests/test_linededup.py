"""Line-level dedup (operators/linededup): boilerplate lines shared
across docs are dropped, unique lines survive in order."""


def test_dedup_lines_and_reassembly(spark):
    from nadry_spark.operators.linededup import line_dedup_text, split_lines, dedup_lines

    docs = spark.createDataFrame(
        [
            (1, "cookie banner\nreal article one\nfooter text"),
            (2, "cookie banner\nreal article two\nfooter text"),
            (3, "cookie banner\nunique musings"),
            (4, "totally original\nnothing shared"),
            (5, "cookie banner\nfooter text"),  # all boilerplate
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"] for r in line_dedup_text(docs, min_docs=2).collect()}
    assert out == {
        1: "real article one",
        2: "real article two",
        3: "unique musings",
        4: "totally original\nnothing shared",
        5: "",
    }

    # threshold respected: min_docs=4 keeps 3x-repeated footer
    kept = dedup_lines(split_lines(docs), min_docs=4)
    lines_left = {(r["doc_id"], r["line"]) for r in kept.collect()}
    assert (1, "footer text") in lines_left          # only 3 docs share it
    assert (1, "cookie banner") not in lines_left    # 4 docs -> dropped

    # same line repeated WITHIN one doc counts once toward the doc count
    docs2 = spark.createDataFrame(
        [(1, "x\nx\nx"), (2, "y")], "doc_id long, text string"
    )
    out2 = {r["doc_id"]: r["text"] for r in line_dedup_text(docs2, min_docs=2).collect()}
    assert out2 == {1: "x\nx\nx", 2: "y"}
