"""A/B: star-sink parquet codec (default snappy vs zstd) — guide §6 /
VERDICT r13 item 3's second half. One codec per process invocation (the
session is created once per process, so the conf is clean); drive
alternating runs from the shell:

  for i in 1 2; do for c in snappy zstd; do
    python tools/star_parquet_ab.py /root/repo/.scratch/star_sf10 $c
  done; done

Prints build wall, output bytes, and the host canaries for adjudication.
"""

from __future__ import annotations

import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import _host_canary
from finegourmet_spark.session import get_spark
from finegourmet_spark.star.pipeline import run_pipeline


def main() -> None:
    data = sys.argv[1]
    codec = sys.argv[2] if len(sys.argv) > 2 else "snappy"
    cpu_c, mem_c = _host_canary()
    spark = get_spark(
        app_name=f"star_parquet_{codec}",
        extra_conf={"spark.sql.parquet.compression.codec": codec},
    )
    assert spark.conf.get("spark.sql.parquet.compression.codec") == codec
    out_dir = f"{data}_out_{codec}"
    t0 = time.time()
    run_pipeline(
        spark,
        sfcc_glob=f"{data}/salesforces/*_sfcc_sales.csv",
        cegid_path=f"{data}/cegid/*.json",
        products_glob=f"{data}/product/*_product_reference.csv",
        boutiques_path=f"{data}/boutiques/2025_boutiques.csv",
        out_dir=out_dir,
    )
    wall = round(time.time() - t0, 1)
    size = subprocess.run(
        ["du", "-sb", out_dir], capture_output=True, text=True, check=True
    ).stdout.split()[0]
    print(
        f"star build [{codec}]: {wall}s, output {int(size) / 2**20:.1f} MiB, "
        f"canaries {cpu_c}/{mem_c}",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
