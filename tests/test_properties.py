"""Property-based tests (hypothesis) for the extraction semantics."""

from hypothesis import given, settings
from hypothesis import strategies as st

from extract_address_ner_spark import oracle
from extract_address_ner_spark.sources.corpus import PLANTED_ADDRESSES

# token alphabet mixing Korean address parts, fillers, and junk
TOKENS = (
    [t for a in PLANTED_ADDRESSES for t in a.split(" ")]
    + ["서울특별시", "경기도", "서울시", "the", "data", "x1", "123", "45-6",
       "길", "동", "신도시에서", "", "먹었어요"]
)

texts = st.lists(st.sampled_from(TOKENS), min_size=0, max_size=30).map(
    " ".join
)


@settings(max_examples=300, deadline=None)
@given(texts)
def test_slice_identity_and_span_sanity(text):
    mentions = oracle.extract_addresses(text)
    prev_end = -1
    for m in mentions:
        # slice identity (reference ml_model.py:369)
        assert m.text == text[m.start : m.end]
        # spans ordered and non-overlapping
        assert m.start > prev_end
        prev_end = m.end
        # confidence is the deterministic tagger's constant mean
        assert abs(m.confidence - 0.85) < 1e-12
        # a span starts with a start-lexicon token
        assert oracle.is_start_token(m.text.split(" ")[0])


@settings(max_examples=300, deadline=None)
@given(texts)
def test_tokenize_offsets_partition_text(text):
    toks = oracle.tokenize_ws(text)
    for tok, s, e in toks:
        assert text[s:e] == tok
        assert " " not in tok and tok != ""
    # tokens are ordered, disjoint, and cover all non-space chars
    covered = sum(e - s for _, s, e in toks)
    assert covered == len(text.replace(" ", ""))


@settings(max_examples=200, deadline=None)
@given(texts, st.integers(0, 40), st.integers(0, 40))
def test_bio_roundtrip_on_aligned_spans(text, a, b):
    """If a gold char span aligns exactly with token boundaries, BIO tagging
    then span-merging recovers it exactly (T2 → I5 round trip)."""
    toks = oracle.tokenize_ws(text)
    if not toks:
        return
    i, j = sorted((a % len(toks), b % len(toks)))
    start, end = toks[i][1], toks[j][2]
    labels = oracle.bio_tags_from_span(toks, start, end)
    confs = [1.0] * len(toks)
    spans = oracle.merge_spans(text, toks, labels, confs)
    assert [(m.start, m.end) for m in spans] == [(start, end)]
    assert spans[0].text == text[start:end]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from(["O", "B-ADDRESS", "I-ADDRESS"]),
                min_size=1, max_size=20))
def test_merge_matches_reference_run_structure(labels):
    """For arbitrary label sequences over fixed tokens, merged spans are
    exactly the maximal non-O runs split at each B (incl. bare-I runs)."""
    text = " ".join("ab" for _ in labels)
    toks = oracle.tokenize_ws(text)
    confs = [0.5] * len(labels)
    spans = oracle.merge_spans(text, toks, labels, confs)
    # reconstruct expected runs imperatively but independently
    runs, cur = [], []
    for idx, lab in enumerate(labels):
        if lab == "B-ADDRESS":
            if cur:
                runs.append(cur)
            cur = [idx]
        elif lab == "I-ADDRESS":
            cur.append(idx)
        else:
            if cur:
                runs.append(cur)
            cur = []
    if cur:
        runs.append(cur)
    assert [(m.start, m.end) for m in spans] == [
        (toks[r[0]][1], toks[r[-1]][2]) for r in runs
    ]
