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


def test_c4_filters(spark):
    from nadry_spark.operators.linededup import c4_filters

    docs = spark.createDataFrame(
        [
            (1, "This is a proper sentence one.\n"
                "Here is a second full sentence!\n"
                "And a third one finishes the doc?"),
            (2, "no terminal punctuation here at all\n"
                "short line.\n"
                "Enable javascript to view this content please."),
            (3, "A fine sentence with enough words here.\n"
                "Another fine sentence with enough words too.\n"
                "function() { return 1; } and more words follow."),
            (4, "Lorem ipsum dolor sit amet, consectetur adipiscing elit.\n"
                "A second proper sentence sits right here.\n"
                "A third proper sentence sits right here."),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["text"], r["kept"]) for r in c4_filters(docs).collect()}
    # doc 1: all three lines survive, 3 sentences -> kept
    assert got[1][1] == 1 and got[1][0].count("\n") == 2
    # doc 2: line 1 no punct, line 2 <5 words, line 3 has 'javascript'
    assert got[2] == ("", 0)
    # doc 3: '{' anywhere kills the doc even though lines are fine
    assert got[3][1] == 0
    # doc 4: 'lorem ipsum' kills the doc
    assert got[4][1] == 0
