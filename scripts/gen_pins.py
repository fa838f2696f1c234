"""Freeze regression-pin oracles for the engine-id-defined queries
(VERDICT r2 #4): `cell_counts_h3` and `footprint_cover` outputs are
deterministic functions of the sf0.01 inputs, but their H3 ids are
engine-canonical (no external SQL ground truth — h3lite.py docstring),
so their oracle is a FROZEN copy of the output, stored as parquet and
served to DuckDB via read_parquet.  Same pattern as the minhash_pairs
literal pins (round 2), at file scale.

Regenerating these pins implicitly re-baselines the engine-id contract
— do it only deliberately, with justification (see tests/golden
policy in gen_goldens.py).

Usage: python scripts/gen_pins.py --write
"""

from __future__ import annotations

import argparse
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
PIN_DIR = os.path.join(REPO, "tests", "golden", "pins")
SF_DIR = "/root/testdata/sf0.01"

#: queries pinned here + the column order their pin files freeze
PINNED = {
    "cell_counts_h3": ["h3_7", "n"],
    "footprint_cover": ["scene_id", "h3_7", "a_m2", "pcov", "ptile"],
    "footprint_polar": ["scene_id", "h3_7", "a_m2", "pcov", "ptile"],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from gips_spark import get_spark

    spark = get_spark("gen-pins", master="local[8]", shuffle_partitions=8)
    qs = entry.queries()
    for name, cols in PINNED.items():
        pdf = qs[name](spark, SF_DIR).toPandas()[cols]
        pdf = pdf.sort_values(cols).reset_index(drop=True)
        path = os.path.join(PIN_DIR, f"{name}.parquet")
        print(f"{name}: {len(pdf)} rows -> {path}")
        if args.write:
            os.makedirs(PIN_DIR, exist_ok=True)
            pq.write_table(
                pa.Table.from_pandas(pdf, preserve_index=False), path,
                compression="zstd",
            )
        else:
            print(pdf.head(3))
    spark.stop()


if __name__ == "__main__":
    main()
