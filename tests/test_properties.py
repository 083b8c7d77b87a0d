"""Property-based tests (hypothesis) for the pure cleaning expressions —
SURVEY.md §5 item 3: idempotence, output-domain invariants, and
engine-vs-Python-model agreement on arbitrary dirty strings.

Strategy: hypothesis generates the corpus per property, then ONE Spark job
evaluates the whole batch (per-example Spark jobs would be pathologically
slow)."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from finegourmet_spark.functions import cleaning

TEXT = st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
    max_size=40,
)


def _batch(spark, fn, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r["out"] for r in df.select(fn(F.col("v")).alias("out")).collect()]


@settings(max_examples=1, deadline=None)
@given(st.lists(TEXT, min_size=200, max_size=200))
def test_normalize_email_idempotent_and_clean(spark, values):
    once = _batch(spark, cleaning.normalize_email, values)
    twice = _batch(spark, cleaning.normalize_email, [v or "" for v in once])
    for a, b in zip(once, twice):
        assert a == b  # idempotent
        assert a == a.lower()  # lowercase
        assert not re.search(r"[^a-z0-9._%+\-@]", a)  # alphabet-closed


@settings(max_examples=1, deadline=None)
@given(st.lists(TEXT, min_size=200, max_size=200))
def test_scrub_control_chars_removes_all(spark, values):
    got = _batch(spark, cleaning.scrub_control_chars, values)
    for v in got:
        assert "\t" not in v and "\r" not in v and "\n" not in v
        assert v == v.strip()


PHONE = st.one_of(
    st.from_regex(r"^[0-9]{0,14}$", fullmatch=True),
    st.text(alphabet="0123456789 +-.", max_size=15),
)


@settings(max_examples=1, deadline=None)
@given(st.lists(PHONE, min_size=300, max_size=300))
def test_normalize_phone_matches_python_model(spark, values):
    """The Spark expression must agree with a direct Python model of the
    reference rule (strip leading 0s; 9 digits ⇒ +33, else NULL)."""

    def model(v: str) -> str | None:
        s = re.sub(r"^0+", "", v)
        return f"+33{s}" if len(s) == 9 and re.fullmatch(r"[0-9]+", s) else None

    got = _batch(spark, cleaning.normalize_phone_fr, values)
    assert got == [model(v) for v in values]


@settings(max_examples=1, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.text(alphabet="0123456789.xX ", max_size=10),
            st.floats(allow_nan=False, allow_infinity=False, width=32).map(str),
        ),
        min_size=300,
        max_size=300,
    )
)
def test_price_validity_never_negative_surprise(spark, values):
    """Output is either NULL or the float the string denotes."""
    got = _batch(spark, cleaning.price_validity, values)
    for v, out in zip(values, got):
        if out is not None:
            assert abs(out - float(v)) < 1e-9


@settings(max_examples=1, deadline=None)
@given(st.lists(st.from_regex(r"^[A-Z0-9]{0,16}$", fullmatch=True), min_size=200, max_size=200))
def test_repair_sale_id_preserves_unrepairable(spark, values):
    got = _batch(spark, cleaning.repair_sale_id, values)
    for v, out in zip(values, got):
        prefix_match = re.match(r"^XX(MO|CL|LI|RE|ST|PA|BO|LY).", v)
        if prefix_match:
            assert out == f"{prefix_match.group(1)}01{v[5:]}"
        else:
            assert out == v


# --- winnowing guarantee (round 3) -----------------------------------------

WORDS = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]),
    min_size=8,
    max_size=30,
)


@settings(max_examples=15, deadline=None)
@given(doc_a=WORDS, doc_b=WORDS, run=st.lists(
    st.sampled_from(["shared1", "shared2", "shared3", "shared4", "shared5",
                     "shared6", "shared7", "shared8"]),
    min_size=6, max_size=10))
def test_winnowing_shared_run_guarantee(spark, doc_a, doc_b, run):
    """The winnowing theorem (Schleimer et al.): two documents sharing a
    token run of length >= w + k - 1 (here 4 + 3 - 1 = 6) MUST share at
    least one fingerprint. Inject the same run into two random documents
    and assert a common (fp) value."""
    import pandas as pd

    from finegourmet_spark.operators.textops import q_winnow_fingerprints

    text_a = " ".join(doc_a[:4] + run + doc_a[4:])
    text_b = " ".join(doc_b[:7] + run + doc_b[7:])
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": [text_a, text_b]})
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        fps = q_winnow_fingerprints(spark, d).collect()
    a = {r["fp"] for r in fps if r["doc_id"] == 1}
    b = {r["fp"] for r in fps if r["doc_id"] == 2}
    assert a & b, "shared >=6-token run must share a winnowing fingerprint"
