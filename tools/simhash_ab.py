"""A/B: q_dedup_simhash's 64 interpreted per-bit folds (shipped) vs an
Arrow-vectorized mapInPandas popcount (VERDICT r13 item 4 — the one
untouched row-interpreted hot loop, dedup.py bit_vote).

Variant A (shipped): per bit j, an interpreted ArrayAggregate fold over
the token-hash array (64 passes/doc), then a shiftleft/bitwiseOR fold —
all JVM expressions, CodegenFallback per element.

Variant B: doc_id+hashes cross the Arrow boundary once; numpy unpacks
the 64 bits of every token hash (little-endian view == (h >> j) & 1),
np.add.reduceat sums per-doc popcounts, and bit_j = (2·pop_j > n_tokens)
reproduces the JVM vote>0 rule exactly (vote = 2·pop − n). The assembled
uint64 is viewed back as int64 — bit 63 (the sign bit) needs no special
case in the unsigned domain.

Equality is asserted before any timing (full collect-and-compare of
(doc_id, simhash) at the probe SF), then both variants are timed
rebuild-per-run with the noop sink, min-of-N — the same methodology as
bench.py, since the r13 dot() lesson says planning cost must be charged.

Usage: python tools/simhash_ab.py [SF_DIR] [n_runs]
"""

from __future__ import annotations

import sys
import time
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

sys.path.insert(0, "/root/repo")

from finegourmet_spark.functions.partitioning import spread
from finegourmet_spark.operators.dedup import normalized_text
from finegourmet_spark.session import get_spark
from finegourmet_spark.sources.testdata import load_table as t

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def _tok(spark) -> DataFrame:
    d = spread(t(spark, SF, "documents")).select(
        "doc_id", normalized_text().alias("txt")
    )
    toks = F.array_distinct(F.split(F.col("txt"), " "))
    return d.select(
        "doc_id", F.transform(toks, lambda s: F.xxhash64(s)).alias("hashes")
    )


def sigs_a(spark) -> DataFrame:
    """Shipped form: 64 interpreted folds (mirror of q_dedup_simhash)."""
    d = _tok(spark)

    def bit_vote(j: int) -> F.Column:
        mask = F.lit((1 << j) if j < 63 else -(1 << 63)).cast("long")
        vote = F.aggregate(
            F.col("hashes"),
            F.lit(0).cast("long"),
            lambda acc, h: acc + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1),
        )
        return F.when(vote > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )

    bits_high_to_low = F.array(*[bit_vote(j) for j in range(63, -1, -1)])
    sim = F.aggregate(
        bits_high_to_low,
        F.lit(0).cast("long"),
        lambda acc, b: F.shiftleft(acc, 1).bitwiseOR(b),
    )
    return d.select("doc_id", sim.alias("simhash"))


def _simhash_batches(
    it: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in it:
        lens = np.fromiter(
            (0 if h is None else len(h) for h in pdf["hashes"]),
            dtype=np.int64,
            count=len(pdf),
        )
        if lens.sum() == 0:
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "simhash": np.zeros(len(pdf), np.int64)}
            )
            continue
        flat = np.concatenate(
            [np.asarray(h, dtype=np.int64) for h in pdf["hashes"] if h is not None and len(h)]
        )
        # bit j of each hash, little-endian byte view: column j == (h>>j)&1
        bits = np.unpackbits(
            flat.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        )  # (n_tokens, 64) uint8
        starts = np.zeros(len(pdf), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        nonempty = lens > 0
        pops = np.zeros((len(pdf), 64), dtype=np.int64)
        # reduceat needs strictly valid segment starts: run it on the
        # nonempty docs only (an empty doc's popcounts stay 0)
        ne_starts = starts[nonempty]
        pops[nonempty] = np.add.reduceat(bits.astype(np.int64), ne_starts, axis=0)
        # JVM rule: bit = (vote > 0) with vote = pop - (n - pop) = 2*pop - n
        bitvals = (2 * pops > lens[:, None]).astype(np.uint64)
        sims = (bitvals << np.arange(64, dtype=np.uint64)[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"], "simhash": sims.view(np.int64)}
        )


def sigs_b(spark) -> DataFrame:
    """Arrow variant: one mapInPandas popcount over (doc_id, hashes)."""
    return _tok(spark).mapInPandas(
        _simhash_batches, schema="doc_id long, simhash long"
    )


def main() -> None:
    spark = get_spark(app_name="simhash_ab")
    # ---- exact-equality gate before any timing -------------------------
    rows_a = {
        (r["doc_id"], r["simhash"]) for r in sigs_a(spark).collect()
    }
    rows_b = {
        (r["doc_id"], r["simhash"]) for r in sigs_b(spark).collect()
    }
    assert rows_a == rows_b, (
        f"variant mismatch: {len(rows_a ^ rows_b)} differing rows, e.g. "
        f"{list(rows_a ^ rows_b)[:3]}"
    )
    print(f"equality OK: {len(rows_a)} identical (doc_id, simhash) rows @ {SF}",
          flush=True)

    # ---- timing: rebuild per run + noop sink (bench methodology) -------
    for label, build in (("A interpreted-folds", sigs_a), ("B mapInPandas", sigs_b)):
        build(spark).write.format("noop").mode("overwrite").save()  # warm
        runs = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            build(spark).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        print(f"{label} @ {SF}: runs {runs} min {min(runs)}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
