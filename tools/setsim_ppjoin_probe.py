"""Measure the PPJoin positional filters' candidate pruning (r13
first-match, r14 prefix-merge — VERDICT r12 item 2 / r13 item 1) on a
mutated fixture.

Rebuilds q_setsim_join_prefix's candidate-generation pipeline THREE ways
from the same token prep — the r12 AllPairs gate (prefix equi-join +
length filter + distinct), the r13 first-match positional filter
(1 + min-position bound), and the r14 prefix-merge bound (count + last
positions) — and prints all counts plus the containment twin's
equivalents. Counts only; the full-query walls come from
tools/sf10_mut_rows.py as usual.

Usage: SPARK_GRAFT_MUT_DIR=... python tools/setsim_ppjoin_probe.py
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from finegourmet_spark.functions.partitioning import spread
from finegourmet_spark.operators.dedup import (
    CONTAIN_DEN,
    CONTAIN_NUM,
    SETSIM_THETA_DEN,
    SETSIM_THETA_NUM,
    normalized_text,
    shingles,
)
from finegourmet_spark.session import get_spark
from finegourmet_spark.sources.testdata import load_table as t

MUT = os.environ.get("SPARK_GRAFT_MUT_DIR", "/root/repo/.scratch/sf10-mut")


def main() -> None:
    spark = get_spark()
    docs = t(spark, MUT, "documents")
    tok = (
        spread(docs)
        .select(
            "doc_id",
            F.transform(
                shingles(normalized_text()), lambda s: F.xxhash64(s)
            ).alias("tk"),
        )
        .filter(F.size("tk") > 0)
    )
    terms = tok.select("doc_id", F.explode("tk").alias("term"))
    dfreq = terms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    ordered = (
        terms.join(dfreq, "term")
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("df"), F.col("term")))
            ).alias("stk")
        )
        .select(
            "doc_id",
            F.size("stk").alias("sz"),
            F.expr(
                "transform(slice(stk, 1, size(stk) - "
                f"ceil({SETSIM_THETA_NUM} * size(stk) "
                f"/ {SETSIM_THETA_DEN}) + 1"
                "), x -> x.term)"
            ).alias("prefix"),
            F.expr("transform(stk, x -> x.term)").alias("otk"),
        )
        .localCheckpoint(eager=True)
    )

    # ---- setsim: AllPairs (r12) vs PPJoin positional (r13) -------------
    pre = ordered.select(
        "doc_id", "sz", F.posexplode("prefix").alias("p0", "term")
    ).select("doc_id", "sz", (F.col("p0") + 1).alias("pos"), "term")
    a, b = pre.alias("a"), pre.alias("b")
    joined = a.join(
        b,
        (F.col("a.term") == F.col("b.term"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & (
            SETSIM_THETA_DEN * F.least(F.col("a.sz"), F.col("b.sz"))
            >= SETSIM_THETA_NUM * F.greatest(F.col("a.sz"), F.col("b.sz"))
        ),
    )
    grouped = joined.groupBy(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.sz").alias("sza"),
        F.col("b.sz").alias("szb"),
    ).agg(
        F.count(F.lit(1)).alias("npfx"),
        F.min(F.col("a.pos")).alias("pa_min"),
        F.min(F.col("b.pos")).alias("pb_min"),
        F.max(F.col("a.pos")).alias("pa_max"),
        F.max(F.col("b.pos")).alias("pb_max"),
    )
    nd = SETSIM_THETA_NUM + SETSIM_THETA_DEN
    alpha = f"({SETSIM_THETA_NUM} * (sza + szb) + {nd - 1}) div {nd}"
    t0 = time.time()
    n_allpairs = grouped.count()
    t1 = time.time()
    n_r13 = grouped.filter(
        F.expr(f"1 + least(sza - pa_min, szb - pb_min) >= {alpha}")
    ).count()
    t2 = time.time()
    n_r14 = grouped.filter(
        F.expr(f"npfx + least(sza - pa_max, szb - pb_max) >= {alpha}")
    ).count()
    t3 = time.time()
    print(
        f"setsim @ {MUT}: allpairs candidates {n_allpairs} "
        f"({t1 - t0:.1f}s), r13 first-match {n_r13} ({t2 - t1:.1f}s), "
        f"r14 prefix-merge {n_r14} ({t3 - t2:.1f}s), "
        f"pruned vs allpairs {100 * (1 - n_r14 / max(1, n_allpairs)):.1f}%, "
        f"vs r13 {100 * (1 - n_r14 / max(1, n_r13)):.1f}%",
        flush=True,
    )

    # ---- setsim r14 shipped form: ASYMMETRIC prefixes + merge bound -----
    # (smaller side explodes only the indexing prefix |x|−⌈2θ/(1+θ)|x|⌉+1;
    # pairs oriented by the (sz, doc_id) total order)
    short_len = F.expr(
        f"sz - (2 * {SETSIM_THETA_NUM} * sz + {nd - 1}) div {nd} + 1"
    )
    aa = pre.filter(F.col("pos") <= short_len).alias("a")
    bb = pre.alias("b")
    asym = (
        aa.join(
            bb,
            (F.col("a.term") == F.col("b.term"))
            & (
                (F.col("a.sz") < F.col("b.sz"))
                | (
                    (F.col("a.sz") == F.col("b.sz"))
                    & (F.col("a.doc_id") < F.col("b.doc_id"))
                )
            )
            & (
                SETSIM_THETA_DEN * F.col("a.sz")
                >= SETSIM_THETA_NUM * F.col("b.sz")
            ),
        )
        .groupBy(
            F.col("a.doc_id").alias("ida"),
            F.col("b.doc_id").alias("idb"),
            F.col("a.sz").alias("sza"),
            F.col("b.sz").alias("szb"),
        )
        .agg(
            F.count(F.lit(1)).alias("npfx"),
            F.max(F.col("a.pos")).alias("pa"),
            F.max(F.col("b.pos")).alias("pb"),
        )
        .filter(F.expr(f"npfx + least(sza - pa, szb - pb) >= {alpha}"))
    )
    # exploded-row volumes: the §2.3 "fewer rows into the exchange" term
    n_pre = pre.count()
    n_short = pre.filter(F.col("pos") <= short_len).count()
    t4 = time.time()
    n_asym = asym.count()
    t5 = time.time()
    print(
        f"setsim-asym @ {MUT}: asymmetric+merge candidates {n_asym} "
        f"({t5 - t4:.1f}s), vs r13 first-match "
        f"{100 * (1 - n_asym / max(1, n_r13)):.1f}% pruned; "
        f"index-side exploded rows {n_short} vs probing {n_pre} "
        f"({100 * (1 - n_short / max(1, n_pre)):.1f}% fewer)",
        flush=True,
    )

    # ---- containment: prefix-hit (r12) vs positional (r13) -------------
    prefix = ordered.select(
        "doc_id",
        "sz",
        F.posexplode(
            F.expr(
                "slice(otk, 1, size(otk) - "
                f"ceil({CONTAIN_NUM} * size(otk) / {CONTAIN_DEN}) + 1)"
            )
        ).alias("p0", "term"),
    ).select("doc_id", "sz", (F.col("p0") + 1).alias("pos"), "term")
    full = ordered.select(
        "doc_id", "sz", F.posexplode("otk").alias("p0", "term")
    ).select("doc_id", "sz", (F.col("p0") + 1).alias("pos"), "term")
    ca, cb = prefix.alias("a"), full.alias("b")
    cgrouped = (
        ca.join(
            cb,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("ida"),
            F.col("b.doc_id").alias("idb"),
            F.col("a.sz").alias("sza"),
            F.col("b.sz").alias("szb"),
        )
        .agg(
            F.count(F.lit(1)).alias("npfx"),
            F.min(F.col("a.pos")).alias("pa_min"),
            F.min(F.col("b.pos")).alias("pb_min"),
            F.max(F.col("a.pos")).alias("pa_max"),
            F.max(F.col("b.pos")).alias("pb_max"),
        )
    )
    calpha = (
        f"({CONTAIN_NUM} * least(sza, szb) + {CONTAIN_DEN - 1}) "
        f"div {CONTAIN_DEN}"
    )

    def _pairs(df):
        return (
            df.select(
                F.least("ida", "idb").alias("doc_a"),
                F.greatest("ida", "idb").alias("doc_b"),
            )
            .distinct()
            .count()
        )

    t0 = time.time()
    n_plain = _pairs(cgrouped)
    t1 = time.time()
    n_r13 = _pairs(
        cgrouped.filter(
            F.expr(f"1 + least(sza - pa_min, szb - pb_min) >= {calpha}")
        )
    )
    t2 = time.time()
    n_r14 = _pairs(
        cgrouped.filter(
            F.expr(f"npfx + least(sza - pa_max, szb - pb_max) >= {calpha}")
        )
    )
    t3 = time.time()
    print(
        f"containment @ {MUT}: prefix-hit candidates {n_plain} "
        f"({t1 - t0:.1f}s), r13 first-match {n_r13} ({t2 - t1:.1f}s), "
        f"r14 prefix-merge {n_r14} ({t3 - t2:.1f}s), "
        f"pruned vs prefix-hit {100 * (1 - n_r14 / max(1, n_plain)):.1f}%, "
        f"vs r13 {100 * (1 - n_r14 / max(1, n_r13)):.1f}%",
        flush=True,
    )

    # ---- containment r14 shipped form: SINGLE (smaller-side) direction —
    # the deciding doc is min(|x|,|y|) by definition, so only the
    # orientation with the (sz, doc_id)-smaller doc on the prefix side is
    # needed; one row per pair, no dedup exchange
    single = (
        ca.join(
            cb,
            (F.col("a.term") == F.col("b.term"))
            & (
                (F.col("a.sz") < F.col("b.sz"))
                | (
                    (F.col("a.sz") == F.col("b.sz"))
                    & (F.col("a.doc_id") < F.col("b.doc_id"))
                )
            ),
        )
        .groupBy(
            F.col("a.doc_id").alias("ida"),
            F.col("b.doc_id").alias("idb"),
            F.col("a.sz").alias("sza"),
            F.col("b.sz").alias("szb"),
        )
        .agg(
            F.count(F.lit(1)).alias("npfx"),
            F.max(F.col("a.pos")).alias("pa"),
            F.max(F.col("b.pos")).alias("pb"),
        )
        .filter(F.expr(f"npfx + least(sza - pa, szb - pb) >= {calpha}"))
    )
    t4 = time.time()
    n_single = single.count()
    t5 = time.time()
    print(
        f"containment-single @ {MUT}: single-direction candidates "
        f"{n_single} ({t5 - t4:.1f}s), vs r13 first-match "
        f"{100 * (1 - n_single / max(1, n_r13)):.1f}% pruned (also drops "
        f"the dedup exchange: one row per pair by the total order)",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
