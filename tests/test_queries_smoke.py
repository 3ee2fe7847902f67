"""Smoke: every declared query runs at sf0.001 and returns rows; oracle
parity for the full set is checked by tools/compare_oracle.py (and the
driver at sf0.01)."""

from __future__ import annotations

import pytest

from etl_java_spark import queries as Q

# streaming/multimodal/LSH queries are exercised by their own tests and
# are slower; the smoke here covers the relational + text corpus.
SMOKE = [n for n in Q.QUERIES if not n.startswith(("q50", "q54", "q55"))]

# legitimately empty at sf0.001 (still oracle-checked for exact
# agreement): the 200-part price k-NN graph has no 4-core.
MAY_BE_EMPTY_AT_SMOKE = {
    "q215_k_core",
    "q347_local_clustering",
    "q370_duplicate_transactions",
    # q565: at sf0.001 (~6 customers/nation) no nation keeps all four
    # 2x2 cells positive, so zero studies survive the wave-17 filter
    # and the stage-2 groupBy is empty (sf0.01 gate has 17 studies)
    "q565_meta_random",
}


@pytest.mark.parametrize("name", SMOKE)
def test_query_runs(spark, sf_small, name):
    df = Q.QUERIES[name](spark, sf_small)
    assert len(df.columns) > 0
    n = df.count()
    assert n > 0 or name in MAY_BE_EMPTY_AT_SMOKE
