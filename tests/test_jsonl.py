"""JSONL corpus source/sink: roundtrip fidelity (unicode included) and
the corrupt-line quarantine path."""

from __future__ import annotations

import os


def test_jsonl_roundtrip_documents(spark, tmp_path):
    from akvorado_spark.sources.jsonl import read_jsonl, write_jsonl

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "shards")
    write_jsonl(docs, path)
    good, bad = read_jsonl(spark, path)
    assert bad.count() == 0
    assert good.count() == docs.count()
    assert good.exceptAll(docs).count() == 0
    assert docs.exceptAll(good).count() == 0


def test_jsonl_unicode_and_newline_fidelity(spark, tmp_path):
    from akvorado_spark.sources.jsonl import read_jsonl, write_jsonl

    rows = [
        (1, "curly “quotes” — und Umlaute äöü", "de", "s", 10),
        (2, "embedded\nnewline and\ttab", "en", "s", 11),
        (3, "emoji 🙂 and   nbsp", "en", "s", 12),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    path = str(tmp_path / "u")
    write_jsonl(df, path)
    good, bad = read_jsonl(spark, path)
    assert bad.count() == 0
    got = {r["doc_id"]: r["text"] for r in good.collect()}
    for doc_id, text, *_ in rows:
        assert got[doc_id] == text, doc_id


def test_jsonl_corrupt_lines_quarantined(spark, tmp_path):
    from akvorado_spark.sources.jsonl import read_jsonl

    path = str(tmp_path / "mixed")
    os.makedirs(path)
    with open(path + "/shard-0.jsonl", "w") as f:
        f.write('{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n')
        f.write("this is not json at all\n")
        f.write('{"doc_id": 2, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}\n')
        f.write('{"doc_id": "not-a-number", "text": "type mismatch"}\n')
    good, bad = read_jsonl(spark, path)
    assert {r["doc_id"] for r in good.collect()} == {1, 2}
    bad_rows = [r["raw_line"] for r in bad.collect()]
    assert len(bad_rows) == 2
    assert any("not json" in b for b in bad_rows)
    assert any("not-a-number" in b for b in bad_rows)


def test_jsonl_plans_are_single_scan_no_cache(spark, tmp_path):
    """Scale contract of the quarantine path: each returned frame is a
    lazy plan with exactly one file scan and NO InMemoryRelation — the
    read never pins the corpus to executor storage (the native json
    reader's corrupt-column workaround would cache everything)."""
    from akvorado_spark.sources.jsonl import read_jsonl, write_jsonl

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "shards")
    write_jsonl(docs, path)
    good, bad = read_jsonl(spark, path)
    for frame in (good, bad):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryRelation" not in plan and "InMemoryTableScan" not in plan
        assert plan.count("FileScan") == 1, plan
    # and from_json's PERMISSIVE semantics really mirror the native
    # reader's corrupt capture for the tricky non-object case
    mixed = str(tmp_path / "m")
    import os as _os

    _os.makedirs(mixed)
    with open(mixed + "/s.jsonl", "w") as f:
        f.write("5\n")          # valid JSON, not an object -> corrupt
        f.write("\n")           # blank line -> skipped, like the reader
        f.write('{"doc_id": 9, "text": "t", "lang": "en", "source": "s", "n_chars": 1}\n')
    g, b = read_jsonl(spark, mixed)
    assert [r["doc_id"] for r in g.collect()] == [9]
    assert [r["raw_line"] for r in b.collect()] == ["5"]
