"""Training-data hygiene operators: PII redaction + eval-set n-gram
decontamination (operators/sanitize.py).

Functional fixtures are hand-computable; plan pins enforce the 100 TB
shapes — pii_redact must stay a NARROW zero-Exchange projection, and
decontaminate must never shuffle the training side before the (broadcast)
join against the eval n-gram set.
"""

import pytest
from pyspark.sql import functions as F

from extract_address_ner_spark.operators.sanitize import (
    decontaminate,
    keep_clean,
    pii_redact,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def pii_df(spark):
    rows = [
        (0, "mail me at alice.smith+x@sub.example.co.kr thanks"),
        (1, "server 192.168.0.1 and 10.0.0.255 are up"),
        (2, "call +82 (10) 1234-5678 now"),
        (3, "user42@example.com at 127.0.0.1 call 555-010-9999"),
        (4, "no pii here at all"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_counts_and_redaction(spark, pii_df):
    out = {r["doc_id"]: r for r in pii_redact(pii_df).collect()}
    assert (out[0]["n_emails"], out[0]["n_ips"], out[0]["n_phones"]) == (1, 0, 0)
    assert out[0]["redacted"] == "mail me at <EMAIL> thanks"
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) == (0, 2, 0)
    assert out[1]["redacted"] == "server <IP> and <IP> are up"
    assert (out[2]["n_emails"], out[2]["n_ips"], out[2]["n_phones"]) == (0, 0, 1)
    assert out[2]["redacted"] == "call <PHONE> now"
    # all three types in one doc; counts are sequential (email → ip → phone)
    assert (out[3]["n_emails"], out[3]["n_ips"], out[3]["n_phones"]) == (1, 1, 1)
    assert out[3]["redacted"] == "<EMAIL> at <IP> call <PHONE>"
    assert (out[4]["n_emails"], out[4]["n_ips"], out[4]["n_phones"]) == (0, 0, 0)
    assert out[4]["redacted"] == "no pii here at all"
    assert out[5]["redacted"] == ""


def test_pii_email_digits_never_count_as_phone(spark):
    """Sequential semantics: the local-part digit run is consumed by the
    email redaction BEFORE the phone scan (the ordering rationale pinned in
    sanitize.PII_STEPS)."""
    df = spark.createDataFrame(
        [(0, "reach 1234567890@example.com ok")], "doc_id long, text string"
    )
    row = pii_redact(df).collect()[0]
    assert (row["n_emails"], row["n_phones"]) == (1, 0)
    assert row["redacted"] == "reach <EMAIL> ok"


def test_pii_redact_plan_is_narrow(spark, pii_df):
    """Zero Exchange: redaction is a pure projection at any corpus size."""
    plan = _plan(pii_redact(pii_df))
    assert "Exchange" not in plan, plan


@pytest.fixture(scope="module")
def decon_corpora(spark):
    # six tokens each → two 5-grams per doc; train doc 10 repeats eval doc
    # 100 verbatim, train doc 11 shares ONE 5-gram window, 12/13 are clean
    train = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta"),
            (11, "x Beta GAMMA delta epsilon zeta"),  # case-folded overlap
            (12, "one two three four five six"),
            (13, "short text"),  # < n tokens: contributes nothing
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    return train, ev


def test_decontaminate_counts(spark, decon_corpora):
    train, ev = decon_corpora
    hits = {r["doc_id"]: r["n_eval_ngrams"] for r in
            decontaminate(train, ev, n=5).collect()}
    assert hits == {10: 2, 11: 1}


def test_keep_clean_drops_contaminated(spark, decon_corpora):
    train, ev = decon_corpora
    kept = sorted(r["doc_id"] for r in keep_clean(train, ev, n=5).collect())
    assert kept == [12, 13]


def test_decontaminate_disjoint_is_empty(spark, decon_corpora):
    train, _ = decon_corpora
    ev = spark.createDataFrame(
        [(0, "totally different eval benchmark sentence here")],
        "doc_id long, text string",
    )
    assert decontaminate(train, ev, n=5).count() == 0


def test_decontaminate_rejects_ng_collision(spark, decon_corpora):
    train, ev = decon_corpora
    with pytest.raises(ValueError, match="_ng"):
        decontaminate(train.withColumnRenamed("text", "_ng"), ev,
                      n=5, text_col="_ng")


def test_decontaminate_plan_broadcasts_eval_side(spark, decon_corpora):
    """The 100 TB shape: eval n-grams broadcast, training side joined with
    NO pre-join shuffle — the only Exchange is the post-join per-doc
    aggregation over the (rare) contamination hits."""
    train, ev = decon_corpora
    conf = spark.conf
    old_aqe = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.adaptive.enabled", "false")  # expose the plan tree
    try:
        df = decontaminate(train, ev, n=5)
        plan = _plan(df)
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        assert "ShuffledHashJoin" not in plan

    # the STREAMED (training) subtree below the broadcast join must carry no
    # Exchange: scan → explode → join, unshuffled at any corpus size. The
    # remaining exchanges are fine — the eval-side distinct happens BEFORE
    # the broadcast (small by construction) and the post-join count-distinct
    # shuffles only actual contamination hits.
        def find_bhj(p):
            if "BroadcastHashJoin" in p.nodeName():
                return p
            ch = p.children()
            for i in range(ch.size()):
                got = find_bhj(ch.apply(i))
                if got is not None:
                    return got
            return None

        bhj = find_bhj(df._jdf.queryExecution().executedPlan())
        assert bhj is not None
        streamed = bhj.children().apply(0).toString()
        assert "BroadcastExchange" not in streamed.splitlines()[0]
        assert "Exchange" not in streamed, streamed
    finally:
        conf.set("spark.sql.adaptive.enabled", old_aqe)


# --------------------------------------------------------------------------
# Unicode NFC normalization (normalize_text)
# --------------------------------------------------------------------------

from extract_address_ner_spark.operators.sanitize import (  # noqa: E402
    normalize_text,
)


@pytest.fixture(scope="module")
def norm_df(spark):
    rows = [
        (0, "plain ascii"),
        (1, "\u1100\u1161 decomposed hangul"),   # NFC: U+AC00
        (2, "cafe\u0301 combining acute"),        # NFC: caf + U+00E9
        (3, "\uac00 precomposed already"),
        (4, "bell\x07 null\x00 kept\ttab\nnl\x7fdel"),
        (5, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_normalize_text_nfc_and_control_strip(spark, norm_df):
    out = {r["doc_id"]: r for r in normalize_text(norm_df).collect()}
    assert out[0]["text_norm"] == "plain ascii" and not out[0]["changed"]
    # decomposed jamo compose to one Hangul syllable
    assert out[1]["text_norm"][0] == "\uac00" and out[1]["changed"]
    assert len(out[1]["text_norm"]) == len(out[1]["text"]) - 1
    # combining acute composes onto the base letter
    assert out[2]["text_norm"].startswith("caf\u00e9 ") and out[2]["changed"]
    # already-NFC text is untouched
    assert out[3]["text_norm"] == out[3]["text"] and not out[3]["changed"]
    # C0 controls and DEL stripped; tab and newline kept
    assert out[4]["text_norm"] == "bell null kept\ttab\nnldel"
    assert out[4]["changed"]
    # NULL passes through as NULL (changed is NULL too — three-valued !=)
    assert out[5]["text_norm"] is None and out[5]["changed"] is None


def test_normalize_text_idempotent(spark, norm_df):
    once = normalize_text(norm_df).select(
        "doc_id", F.col("text_norm").alias("text"))
    twice = normalize_text(once).collect()
    assert all(not r["changed"] for r in twice if r["changed"] is not None)


def test_normalize_text_restores_hash_equality(spark):
    """The operator's reason to exist: byte-keyed operators (sha256 dedup,
    MinHash, window values) see decomposed and precomposed spellings as
    DIFFERENT docs until normalization makes them byte-identical."""
    rows = [(0, "\u1100\u1161\u1102\u1161\u1103\u1161 station"),
            (1, "\uac00\ub098\ub2e4 station")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    raw = df.select(F.sha2("text", 256).alias("h")).distinct().count()
    norm = normalize_text(df).select(
        F.sha2("text_norm", 256).alias("h")).distinct().count()
    assert raw == 2 and norm == 1


def test_normalize_text_rejects_output_collision(spark, norm_df):
    with pytest.raises(ValueError, match="text_norm"):
        normalize_text(norm_df.withColumn("text_norm", norm_df.text))
