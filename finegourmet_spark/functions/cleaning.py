"""Cleaning / standardization expressions — pure Column-in → Column-out.

Each function re-expresses one reference cleaning rule (citations per
function) as a single declarative expression: unit-testable without I/O,
whole-stage-codegen friendly, and applied in ONE select per frame (the
reference chains 12+ withColumn calls, bloating plan build —
etl/transform.py:53-57; SURVEY.md §2A X1).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: the 13 valid store codes (reference etl/transform.py:223-237)
VALID_STORE_IDS = [
    "PA01", "PA02", "PA03", "BO01", "BO02", "MO01", "LY01",
    "LY02", "MA01", "LI01", "RE01", "ST01", "CL01",
]

#: corrupt-prefix repair targets (reference etl/transform.py:185-220 handles
#: these 8 city codes via 8 hand-written when-branches)
REPAIRABLE_PREFIXES = ["MO", "CL", "LI", "RE", "ST", "PA", "BO", "LY"]


def scrub_control_chars(col: Column) -> Column:
    """Collapse tabs/CR/LF to a space and trim (ref etl/transform.py:53-57)."""
    return F.trim(F.regexp_replace(col, r"[\t\r\n]+", " "))


def normalize_email(col: Column) -> Column:
    """Lowercase, trim, strip characters outside the email alphabet
    (ref etl/transform.py:61,264,372,393 — applied there in four places and
    *after* grouping, which can desynchronize dim and fact emails; the engine
    applies this once, upstream of every consumer — SURVEY.md §3.3.2).

    DELIBERATE divergence from the reference: the ref's character class
    ``[^a-zA-Z0-9._%+-@]+`` contains an accidental ``+-@`` RANGE, so it also
    preserves , - . / : ; < = > ? — emails containing those characters
    normalize differently here. This engine escapes the dash
    (``[...%+\\-@]``), i.e. the alphabet the reference plainly intended —
    an intentional fix of the malformed class, like the other SURVEY-cited
    reference-bug fixes (documented for consumers migrating from the ref)."""
    return F.lower(F.trim(F.regexp_replace(col, r"[^a-zA-Z0-9._%+\-@]+", "")))


def normalize_phone_fr(col: Column) -> Column:
    """French phone standardization (ref etl/transform.py:72-87, exact
    semantics): strip leading zeros; if the remainder is 9 digits → '+33' +
    digits; anything else (including valid-looking numbers that lost more
    than one leading 0) → NULL."""
    stripped = F.regexp_replace(col, r"^0+", "")
    ok = (F.length(stripped) == 9) & stripped.rlike(r"^[0-9]+$")
    return F.when(ok, F.concat(F.lit("+33"), stripped)).otherwise(F.lit(None).cast("string"))


def unquote(col: Column) -> Column:
    """Strip wrapping quotes then any stray double-quotes
    (ref etl/transform.py:64-70,308-311)."""
    return F.regexp_replace(F.regexp_replace(col, r'^\s*"|"\s*$', ""), r'"', "")


def price_validity(col: Column) -> Column:
    """Price validity gate (ref etl/transform.py:140-149, EXACT semantics):
    NULL / blank / literal 'X' / non-castable → NULL, else double.

    N.B. the data's lowercase 'x' (2024_cegid_sales.json:1817) is caught by
    the cast-fails arm, not the 'X' comparison — both arms preserved."""
    s = col.cast("string")
    bad = (
        col.isNull()
        | (F.trim(s) == "")
        | (s == "X")
        | s.try_cast("double").isNull()
    )
    return F.when(bad, F.lit(None).cast("double")).otherwise(s.try_cast("double"))


def repair_sale_id(col: Column) -> Column:
    """Corrupt sale-ID repair: ``XX{CODE}…`` → ``{CODE}01`` + substr(6) for
    the 8 city codes — one regexp_replace replacing the reference's 8-branch
    when-ladder (etl/transform.py:184-220; SURVEY.md §2A X6).

    The regex consumes 5 chars (XX + code + one) matching the reference's
    exact (quirky) semantics: ``concat(lit('MO01'), substr(6, 100))`` drops
    the 5th character, so XXMO240100002 → MO0140100002."""
    pattern = "^XX(" + "|".join(REPAIRABLE_PREFIXES) + ")."
    return F.regexp_replace(col, pattern, "$101")


def derive_store_id(sale_id: Column) -> Column:
    """Store id from the sale-id prefix: 4-char prefix if whitelisted, else
    XX+code → {code}01 if repairable, else NULL (ref etl/transform.py:222-251)."""
    prefix = F.substring(sale_id, 1, 4)
    xx_code = F.substring(sale_id, 3, 2)
    return (
        F.when(prefix.isin(VALID_STORE_IDS), prefix)
        .when(
            prefix.startswith("XX") & xx_code.isin(REPAIRABLE_PREFIXES),
            F.concat(xx_code, F.lit("01")),
        )
        .otherwise(F.lit(None).cast("string"))
    )


def dedup_suffix(id_col: Column, rownum_col: Column) -> Column:
    """Duplicate-id disambiguation: occurrences ≥2 get an ``_N`` suffix
    (ref etl/transform.py:253-261 window W1)."""
    return F.when(rownum_col == 1, id_col).otherwise(
        F.concat_ws("_", id_col, rownum_col.cast("string"))
    )
