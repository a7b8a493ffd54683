"""Every declared query's build() must be lazy — composing the plan must not
trigger a Spark job (an eager action in a build path becomes a full extra
scan at 100 TB; see the tfidf_top_terms docs.count() regression).

Exemption: queries whose semantics REQUIRE training (pyspark.ml fit) — the
fit itself is the eager part, documented at the declaration site.

Also pins the registry ordering contract: the driver checks the first 50
entries, which must contain every hash-checked §2 / training-data operator.
"""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame

from simpy__kafka__flink__kafka_spark.plans import CHECKED_FIRST, registry

# training is inherently eager (ml fit / the BPE driver merge loop); these
# are rows-only declared and documented at the declaration site
TRAINING_QUERIES = {"ml_lsh_neighbors", "ivf_topk_trained", "bpe_merges",
                    "bpe_tokenize", "bpe_vocab", "unigram_tokenize",
                    "pq_topk_rerank"}

ACTIONS = ["collect", "count", "first", "head", "take", "toPandas", "foreach",
            "foreachPartition", "toLocalIterator"]


@pytest.fixture()
def no_actions(monkeypatch):
    def boom(name):
        def _raise(self, *a, **k):
            raise AssertionError(f"eager DataFrame.{name}() in a build path")
        return _raise

    for name in ACTIONS:
        monkeypatch.setattr(DataFrame, name, boom(name))


def test_builds_are_lazy(spark, sf_dir, no_actions):
    for name, q in registry().items():
        if name in TRAINING_QUERIES:
            continue
        df = q.build(spark, sf_dir)
        assert df is not None, name


def test_checked_first_50_cover_core_operators():
    reg = registry()
    first50 = list(reg)[:50]
    assert first50 == CHECKED_FIRST
    # every checked-first query must be hash-checkable (has an oracle):
    # since the round-8 rotation (pq_topk_rerank back to the tail — a
    # rows-only row at the gate is strictly weaker than the same row in
    # the pytest tail where recall >= 0.9 is pinned) the checked-50 is
    # 100% hash-greenable
    for name in CHECKED_FIRST:
        assert reg[name].oracle is not None, f"{name} in checked-50 lacks an oracle"
