"""Two-parallelism scaling evidence (north_rule: ≥0.8 efficiency N→4N).

Runs the primary stage (extract+geocode+tile-assign on 1M synthetic
pages) at local[8] and local[32] in separate JVMs, warmup + N timed
trials each, reports the median rows/sec and the scaling efficiency
rps32 / (4 · rps8).  Writes BENCH/BASELINE.md.

The sandbox host shows bursty CPU (identical trials vary several ×), so
medians over trials are the honest statistic; on a real cluster this is
two spark-submit runs at N and 4N executors (jobs/run_stage.py).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TRIAL_CODE = r"""
import time, json, sys
from gips_spark import get_spark
from gips_spark.operators import tile_assign, cell_directory, pip_join, knn, zonal
from gips_spark.sources import fixtures
cpus = int(sys.argv[1]); trials = int(sys.argv[2])
spark = get_spark('scal', master=f'local[{cpus}]', shuffle_partitions=cpus)
cache = sys.argv[3]
pages = spark.read.parquet(cache)
# warmup: spawn ALL python workers (>= cpus partitions) + JIT plan shapes
warm = pages.limit(60000).repartition(cpus * 2)
tile_assign.enrich_pages(warm, persist=False, do_repartition=False) \
    .write.format('noop').mode('overwrite').save()
out = {'assign': [], 'pip': [], 'knn': [], 'zonal': []}
extents = fixtures.gen_extents(spark)
queries = fixtures.gen_knn_queries(spark)
raster = sys.argv[4]
for t in range(trials):
    spark.catalog.clearCache()  # no cross-trial cache reuse (plan matching)
    t0 = time.monotonic()
    enr = tile_assign.enrich_pages(pages, salt_target_rows=5000)
    n = enr.count()
    out['assign'].append(time.monotonic() - t0)
    directory = cell_directory.build_cell_directory(enr).persist()
    directory.count()
    t0 = time.monotonic()
    pip_join.pip_join_cells(spark, enr, extents, directory).write.format('noop').mode('overwrite').save()
    out['pip'].append(time.monotonic() - t0)
    t0 = time.monotonic()
    knn.knn_join(spark, enr, queries, directory).write.format('noop').mode('overwrite').save()
    out['knn'].append(time.monotonic() - t0)
    t0 = time.monotonic()
    chunks = spark.read.parquet(raster)
    zonal.zonal_stats(spark, zonal.compute_products(chunks), extents).write.format('noop').mode('overwrite').save()
    out['zonal'].append(time.monotonic() - t0)
    enr.unpersist(); directory.unpersist()
print('RESULT ' + json.dumps({'cpus': cpus, 'rows': n, 'timings': out}))
spark.stop()
"""


def run_level(cpus: int, trials: int, cache: str, raster: str) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", TRIAL_CODE, str(cpus), str(trials), cache, raster],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=3000,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no result (rc={p.returncode}):\n{p.stderr[-2000:]}")


def main():
    trials = int(os.environ.get("SCALING_TRIALS", "3"))
    cache = os.path.join(REPO, ".bench_cache", "pages_1000000")
    raster = os.path.join(REPO, ".bench_cache", "raster_60")
    assert os.path.isdir(cache) and os.path.isdir(raster), "run bench.py once first"

    # interleave the two levels, one trial per JVM, to control for the
    # host's bursty CPU (throughput drifts >10x between minutes)
    res = {8: None, 32: None}
    for _ in range(trials):
        for c in (8, 32):
            r = run_level(c, 1, cache, raster)
            if res[c] is None:
                res[c] = r
            else:
                for k in r["timings"]:
                    res[c]["timings"][k].extend(r["timings"][k])
    rows = res[8]["rows"]

    lines = [
        "# BENCH/BASELINE — measured throughput & scaling evidence",
        "",
        "Input: 1,000,000 deterministic synthetic pages (seed-stable, 40% hotspot",
        "skew, FIXTURES.md §1), parquet, 128 files.  Sandbox proxy for two cluster",
        f"sizes: `local[8]` vs `local[32]`, {trials} timed trials per level",
        "(interleaved single-trial JVMs, warmup pass each; the host CPU is",
        "bursty so levels are alternated and medians reported).",
        "",
        "| stage | median s @8 | median s @32 | rows/s @8 | rows/s @32 | speedup | efficiency (×4) |",
        "|---|---|---|---|---|---|---|",
    ]
    summary = {}
    for stage in ["assign", "pip", "knn", "zonal"]:
        m8 = statistics.median(res[8]["timings"][stage])
        m32 = statistics.median(res[32]["timings"][stage])
        r8 = rows / m8
        r32 = rows / m32
        eff = (m8 / m32) / 4.0
        summary[stage] = {"s8": m8, "s32": m32, "eff": round(eff, 3)}
        lines.append(
            f"| {stage} | {m8:.1f} | {m32:.1f} | {r8:,.0f} | {r32:,.0f} | "
            f"{m8 / m32:.2f}× | {eff:.2f} |"
        )
    a = summary["assign"]
    lines += [
        "",
        f"**Primary metric (tile-assignment rows/sec):** {rows/a['s8']:,.0f} @8 → "
        f"{rows/a['s32']:,.0f} @32; scaling efficiency "
        f"**{a['eff']:.2f}** (target ≥ 0.8 per BASELINE.json; "
        "per-stage table above; raw trials below).",
        "",
        "Raw trial timings (seconds):",
        "```json",
        json.dumps({str(c): res[c]["timings"] for c in res}, indent=2),
        "```",
        "",
        "Methodology notes:",
        "- warmup pass excluded (Python worker spawn + JIT);",
        "- stage (a) includes parquet scan → JVM strip → fused Arrow kernel →",
        "  salt-histogram broadcast join → repartitionByRange(cell_prefix, salt);",
        "- the dominant sandbox cost is the JVM↔Python Arrow socket (measured:",
        "  ~80% system CPU during UDF stages on this kernel); the engine ships",
        "  stripped text (162 B/row avg) instead of raw html (347 B/row) through",
        "  the channel for exactly this reason;",
        "- on a real cluster the two levels are N and 4N executors via",
        "  `spark-submit --py-files` (jobs/run_stage.py).",
    ]
    out = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps(summary))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
