"""Unit + property tests for the pure cleaning expressions
(finegourmet_spark/functions/cleaning.py) — SURVEY.md §5 item 3."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finegourmet_spark.functions import cleaning


def _apply(spark, fn, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r["out"] for r in df.select(fn(F.col("v")).alias("out")).collect()]


def test_normalize_phone_fr(spark):
    cases = {
        "0612345678": "+33612345678",  # standard mobile
        "612345678": "+33612345678",  # already stripped
        "0061234567 8": None,  # space → non-digit → NULL
        "061234567": None,  # 8 digits after strip → NULL
        "06123456789": None,  # 10 digits after strip → NULL
        "": None,
        "0000612345678": None,  # over-stripped zeros leave 9? "612345678" → wait
    }
    # over-stripped: "0000612345678" strips ALL leading 0s → "612345678" = 9 digits → +33
    cases["0000612345678"] = "+33612345678"
    got = _apply(spark, cleaning.normalize_phone_fr, list(cases))
    assert got == list(cases.values())


def test_normalize_email_idempotent(spark):
    vals = [" EMMA.Bernard@GMAIL.com ", "a b@c.fr", "weird!#chars@x.io", "ok@ok.com"]
    once = _apply(spark, cleaning.normalize_email, vals)
    twice = _apply(spark, cleaning.normalize_email, once)
    assert once == twice  # normalization is idempotent
    assert once[0] == "emma.bernard@gmail.com"
    assert once[1] == "ab@c.fr"


def test_scrub_control_chars(spark):
    got = _apply(spark, cleaning.scrub_control_chars, ["a\tb", "a\r\nb", " x \t "])
    assert got == ["a b", "a b", "x"]


def test_unquote(spark):
    got = _apply(spark, cleaning.unquote, ['"1 Rue, Paris"', ' "x" ', 'a"b'])
    assert got == ["1 Rue, Paris", "x", "ab"]


def test_price_validity(spark):
    vals = [None, "", "  ", "X", "x", "12.5", "7", "1,5", "abc"]
    got = _apply(spark, cleaning.price_validity, vals)
    assert got == [None, None, None, None, None, 12.5, 7.0, None, None]


def test_repair_sale_id_all_prefixes(spark):
    vals = [f"XX{c}240100001" for c in cleaning.REPAIRABLE_PREFIXES] + [
        "XXQQ240100001",  # non-repairable code untouched
        "PA01240100001",  # already valid untouched
    ]
    got = _apply(spark, cleaning.repair_sale_id, vals)
    # exact ref semantics: '{CODE}01' + substr(6) — 5th char dropped
    assert got[: len(cleaning.REPAIRABLE_PREFIXES)] == [
        f"{c}0140100001" for c in cleaning.REPAIRABLE_PREFIXES
    ]
    assert got[-2:] == ["XXQQ240100001", "PA01240100001"]


def test_derive_store_id(spark):
    vals = ["PA01240100001", "XXMO240100002", "ZZZZ240100003", "MA01xxx"]
    got = _apply(spark, cleaning.derive_store_id, vals)
    assert got == ["PA01", "MO01", None, "MA01"]


@pytest.mark.parametrize("n", [2, 5])
def test_dedup_suffix_deterministic_under_repartition(spark, n):
    """Survivor policy must not depend on partitioning (the reference's
    dropDuplicates does — SURVEY.md §4.2)."""
    from pyspark.sql.window import Window

    rows = [("A", i) for i in range(3)] + [("B", 0)]
    df = spark.createDataFrame(rows, "id string, seq int").repartition(n)
    w = Window.partitionBy("id").orderBy("seq")
    out = {
        (r["id"], r["seq"]): r["out"]
        for r in df.select(
            "id",
            "seq",
            cleaning.dedup_suffix(F.col("id"), F.row_number().over(w)).alias("out"),
        ).collect()
    }
    assert out[("A", 0)] == "A" and out[("A", 1)] == "A_2" and out[("A", 2)] == "A_3"
    assert out[("B", 0)] == "B"
