"""Scale smoke: the heavyweight operators at sf0.1 (the bench scale —
10× the correctness scale) complete and return sane results. Catches
the quadratic-blowup class of regression that sf0.01 is too small to
expose (e.g. a dedup candidate join degenerating to all-pairs)."""

from __future__ import annotations

import pytest

from kompactor_spark.queries import all_queries

SF = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def Q(spark):
    return all_queries()


def test_jaccard_pairs_blocked_not_allpairs(spark, Q):
    """5000 docs → 12.5M raw pairs; the inverted-index blocking must
    keep the candidate set (and runtime) far below that."""
    n = Q["l2_jaccard_pairs"](spark, SF).count()
    assert 0 < n < 100_000, f"candidate blow-up: {n} pairs"


def test_dedup_clusters_converge_at_scale(spark, Q):
    out = Q["l2_dedup_clusters"](spark, SF)
    rows = out.count()
    assert rows == 5000  # every doc labeled
    clusters = out.select("cluster_id").distinct().count()
    assert clusters < rows  # at least some merging happened


def test_minhash_lsh_at_scale(spark, Q):
    n = Q["l2_minhash_lsh"](spark, SF).count()
    assert 0 < n < 100_000


def test_star_join_row_total(spark, Q):
    r = Q["j9_star_join"](spark, SF)
    rows = r.collect()
    assert sum(x.n_items for x in rows) == 600_000  # every lineitem accounted for


def test_minhash_banded_at_scale(spark, Q):
    n = Q["l2_minhash_banded"](spark, SF).count()
    assert 0 < n < 100_000
