"""Literal/comment extraction from source code."""

import pandas as pd

from extract_address_ner_spark.operators.code_extract import (
    extract_code_segments,
    extract_mentions_from_code,
)
from extract_address_ner_spark.sources import corpus as C


def test_segments_on_handwritten_sources(spark):
    rows = [
        (0, "python", 'x = "서울특별시 강남구 테헤란로 123번길 45"  # 경기도 성남시 분당구 판교역로 235\ny = 1'),
        (1, "javascript", "// c1\nlet a = `부산광역시 해운대구 해운대해변로 264`;\n/* block\ncomment */"),
        (2, "markdown", "그냥 텍스트 경상북도 경주시 보문로 507 끝"),
        (3, "go", 's := "no address"'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, content string")
    segs = extract_code_segments(df, key_cols=("doc_id",)).collect()
    by_doc = {}
    for r in segs:
        by_doc.setdefault(r["doc_id"], []).append(r)
        # slice identity of segments
        content = dict(rows)[r["doc_id"]] if False else None
    contents = {i: c for i, _l, c in rows}
    for r in segs:
        assert contents[r["doc_id"]][r["seg_start"]:r["seg_end"]] == r["seg_text"]
    types0 = sorted((r["seg_type"], r["seg_text"]) for r in by_doc[0])
    assert ("string", "서울특별시 강남구 테헤란로 123번길 45") in types0
    assert any(t == "comment" and "경기도" in s for t, s in types0)
    types1 = {(r["seg_type"]) for r in by_doc[1]}
    assert types1 == {"string", "comment"}
    assert [r["seg_type"] for r in by_doc[2]] == ["text"]


def test_code_mentions_offsets_and_slice_identity(spark, sf_smoke):
    corpus = C.code_corpus_from_documents(spark, sf_smoke)
    m = extract_mentions_from_code(corpus)
    j = m.alias("m").join(corpus.alias("c"), on="doc_id")
    bad = j.filter(
        "substring(c.content, m.m_start + 1, m.m_end - m.m_start) <> m.mention_text"
    ).count()
    assert bad == 0
    per_type = {r["seg_type"]: r["cnt"] for r in
                m.groupBy("seg_type").count().withColumnRenamed("count", "cnt").collect()}
    assert set(per_type) == {"comment", "string", "text"}
    # every non-markdown file yields exactly 2 mentions, markdown exactly 1
    n_md = corpus.filter("lang = 'markdown'").count()
    n_other = corpus.count() - n_md
    assert per_type["text"] == n_md
    assert per_type["comment"] == n_other
    assert per_type["string"] == n_other


def test_lexer_escaped_quotes_and_nested_markers(spark):
    """Adversarial sources: escaped quotes inside literals, comment markers
    inside strings, quotes inside comments — the lexer (single left-to-right
    alternation scan) must never emit overlapping or split segments."""
    addr = "서울시 \\\"강남구\\\""  # source-level: 서울시 \"강남구\"
    rows = [
        # escaped double quotes inside a python string: ONE string segment
        (0, "python", f'x = "{addr}"'),
        # '#' inside a string must NOT open a comment
        (1, "python", 'u = "http://example.com#frag"  # real comment'),
        # quote inside a comment must NOT open a string
        (2, "python", '# it"s a comment\ny = 1'),
        # '//' inside a JS string must NOT open a comment
        (3, "javascript", 'let u = "https://x.dev/p"; // tail'),
        # escaped backslash then quote: "a\\" is a complete literal
        (4, "python", r'z = "a\\" # c'),
        # go raw string spans newlines, takes no escapes
        (5, "go", 's := `line1\nline2` // c'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, content string")
    segs = extract_code_segments(df, key_cols=("doc_id",)).collect()
    by_doc = {}
    for r in segs:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["seg_type"], r["seg_start"], r["seg_end"], r["seg_text"]))
    contents = {i: c for i, _l, c in rows}
    for r in segs:  # slice identity always
        assert contents[r["doc_id"]][r["seg_start"]:r["seg_end"]] == r["seg_text"]
    for _doc, ss in by_doc.items():  # no overlapping segments anywhere
        spans = sorted((s, e) for _t, s, e, _x in ss)
        assert all(spans[i][1] <= spans[i + 1][0] for i in range(len(spans) - 1))
    inner0 = '서울시 \\"강남구\\"'
    assert by_doc[0] == [("string", 5, 5 + len(inner0), inner0)]
    assert [x for t, _s, _e, x in by_doc[1] if t == "string"] == [
        "http://example.com#frag"]
    assert [x for t, _s, _e, x in by_doc[1] if t == "comment"] == [
        " real comment"]
    assert [t for t, _s, _e, _x in by_doc[2]] == ["comment"]
    assert [x for t, _s, _e, x in by_doc[3] if t == "string"] == [
        "https://x.dev/p"]
    assert [x for t, _s, _e, x in by_doc[3] if t == "comment"] == [" tail"]
    assert by_doc[4] == [("string", 5, 8, "a\\\\"), ("comment", 11, 13, " c")]
    assert [x for t, _s, _e, x in by_doc[5] if t == "string"] == [
        "line1\nline2"]


def test_lexer_escaped_quote_mention_rebase(spark):
    """A planted address containing an escaped quote is still ONE mention
    with global offsets that slice-identify against the file."""
    content = 'addr = "서울특별시 강남구 테헤란로 123번길 45"  # 부산광역시 해운대구 해운대해변로 264'
    df = spark.createDataFrame(
        [(0, "python", content)], "doc_id long, lang string, content string")
    m = extract_mentions_from_code(df, key_cols=("doc_id",)).collect()
    got = {(r["seg_type"], r["mention_text"]) for r in m}
    assert ("string", "서울특별시 강남구 테헤란로 123번길 45") in got
    assert ("comment", "부산광역시 해운대구 해운대해변로 264") in got
    for r in m:
        assert content[r["m_start"]:r["m_end"]] == r["mention_text"]


def test_unknown_lang_degrades_to_text(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "lang": ["rust"],
                      "content": ["인천광역시 중구 월미로 329"]})
    )
    segs = extract_code_segments(df, key_cols=("doc_id",)).collect()
    assert [(r["seg_type"], r["seg_start"], r["seg_end"]) for r in segs] == [
        ("text", 0, 16)
    ]
    m = extract_mentions_from_code(df, key_cols=("doc_id",)).collect()
    assert [(r["mention_text"], r["m_start"], r["m_end"]) for r in m] == [
        ("인천광역시 중구 월미로 329", 0, 16)
    ]
