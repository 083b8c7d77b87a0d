"""Quick local parity check for a subset of registered queries.

Usage: python tools/check_parity.py q_name [q_name ...] [--sf SFDIR ...]
Runs each query against its oracle at the given sf dirs (default sf0.001
and sf0.01) using the same comparison the driver applies.
"""

from __future__ import annotations

import sys
import time

import __spark_entry__ as contract
from finegourmet_spark.session import get_spark
from tests.oracle_harness import compare


def main() -> int:
    args = sys.argv[1:]
    sfs = []
    names = []
    it = iter(args)
    for a in it:
        if a == "--sf":
            sfs.append(next(it))
        else:
            names.append(a)
    if not sfs:
        sfs = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    spark = get_spark()
    q = contract.queries()
    o = contract.oracle_sql()
    bad = 0
    for name in names:
        for sf in sfs:
            t0 = time.time()
            if name not in o:
                n = q[name](spark, sf).count()
                print(f"{name} @ {sf}: rows-only, {n} rows "
                      f"({time.time() - t0:.1f}s)")
                continue
            problems = compare(q[name](spark, sf), o[name], sf)
            status = "OK" if not problems else "FAIL"
            print(f"{name} @ {sf}: {status} ({time.time() - t0:.1f}s)")
            for p in problems:
                print("   ", p)
            bad += bool(problems)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
