"""North_rule deployment-shape smoke: the SAME engine code on a true
multi-executor master (local-cluster = separate executor JVMs, code
shipped via py-files exactly like `spark-submit --py-files
gips_spark.zip` on a real cluster).

Validates end-to-end: cross-JVM shuffles, broadcast variables reaching
remote executors, Arrow UDFs inside executor-local Python workers, and
the zip packaging.  Run: python scripts/lc_smoke.py
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
subprocess.run(
    ["bash", "scripts/package_zip.sh"], check=True, capture_output=True, cwd=REPO
)
from gips_spark import get_spark  # noqa: E402

spark = get_spark(
    "lc-smoke",
    master="local-cluster[2,4,3072]",
    shuffle_partitions=8,
    extra_conf={"spark.submit.pyFiles": f"{REPO}/gips_spark.zip"},
)
spark.sparkContext.addPyFile(f"{REPO}/gips_spark.zip")
from gips_spark.operators import tile_assign  # noqa: E402

pages = spark.read.parquet(f"{REPO}/.bench_cache/pages_100000")
warm = pages.limit(20000).repartition(16)
tile_assign.enrich_pages(
    warm, persist=False, do_repartition=False, salt_sample=0.02
).write.format("noop").mode("overwrite").save()
t0 = time.monotonic()
tile_assign.enrich_pages(pages, salt_target_rows=5000, salt_sample=0.02).write.format(
    "noop"
).mode("overwrite").save()
dt = time.monotonic() - t0
n = pages.count()
print(
    "RESULT "
    + json.dumps(
        {
            "master": "local-cluster[2,4,3072]",
            "rows": n,
            "sec": round(dt, 1),
            "rows_per_sec": round(n / dt),
        }
    )
)
spark.stop()
