"""Physical-plan regression gate (VERDICT r3 next #6): the explain-audit
checks run in CI, so a lost broadcast, a new InMemoryRelation, or a
row-wise Python stage sneaking into a headline plan fails pytest — not
just the out-of-band scripts/explain_audit.py run.

Fast mode: a small parquet-backed pages table (the pruning/pushdown
checks need a real FileScan, so the conftest in-memory fixture won't
do).  Plan SHAPE is size-independent for every audited property.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def parquet_pages(spark, tmp_path_factory):
    from gips_spark.sources import fixtures

    path = str(tmp_path_factory.mktemp("plans") / "pages")
    fixtures.gen_pages(spark, 3000).write.parquet(path)
    return spark.read.parquet(path)


def test_plan_audit_checks(spark, parquet_pages):
    import sys
    import os

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
    )
    from explain_audit import run_audit

    sections, checks = run_audit(spark, parquet_pages, salt_target_rows=200)
    failed = [name for name, ok in checks if not ok]
    assert not failed, f"plan checks failed: {failed}\n" + "\n\n".join(
        f"== {t}\n{sections[t]}" for t in sections
    )
    assert len(checks) >= 15
