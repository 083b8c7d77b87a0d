"""Measure the PPJoin positional filter's candidate pruning (r13,
VERDICT r12 item 2) on a mutated fixture.

Rebuilds q_setsim_join_prefix's candidate-generation pipeline twice from
the same token prep — once with the r12 AllPairs gate (prefix equi-join +
length filter + distinct: the 15.25M-candidate / 58:1 anchor at
sf10-mut) and once with the r13 positional filter stacked on top — and
prints both counts plus the containment twin's equivalents. Counts only;
the full-query walls come from tools/sf10_mut_rows.py as usual.

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
        F.min(F.col("a.pos")).alias("pa"), F.min(F.col("b.pos")).alias("pb")
    )
    nd = SETSIM_THETA_NUM + SETSIM_THETA_DEN
    t0 = time.time()
    n_allpairs = grouped.count()
    t1 = time.time()
    n_ppjoin = grouped.filter(
        F.expr(
            "1 + least(sza - pa, szb - pb) >= "
            f"({SETSIM_THETA_NUM} * (sza + szb) + {nd - 1}) div {nd}"
        )
    ).count()
    t2 = time.time()
    print(
        f"setsim @ {MUT}: allpairs candidates {n_allpairs} "
        f"({t1 - t0:.1f}s), ppjoin candidates {n_ppjoin} ({t2 - t1:.1f}s), "
        f"pruned {100 * (1 - n_ppjoin / max(1, n_allpairs)):.1f}%",
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
            F.min(F.col("a.pos")).alias("pa"),
            F.min(F.col("b.pos")).alias("pb"),
        )
    )
    t0 = time.time()
    n_plain = (
        cgrouped.select(
            F.least("ida", "idb").alias("doc_a"),
            F.greatest("ida", "idb").alias("doc_b"),
        )
        .distinct()
        .count()
    )
    t1 = time.time()
    n_pos = (
        cgrouped.filter(
            F.expr(
                "1 + least(sza - pa, szb - pb) >= "
                f"({CONTAIN_NUM} * least(sza, szb) + {CONTAIN_DEN - 1}) "
                f"div {CONTAIN_DEN}"
            )
        )
        .select(
            F.least("ida", "idb").alias("doc_a"),
            F.greatest("ida", "idb").alias("doc_b"),
        )
        .distinct()
        .count()
    )
    t2 = time.time()
    print(
        f"containment @ {MUT}: prefix-hit candidates {n_plain} "
        f"({t1 - t0:.1f}s), positional candidates {n_pos} ({t2 - t1:.1f}s), "
        f"pruned {100 * (1 - n_pos / max(1, n_plain)):.1f}%",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
