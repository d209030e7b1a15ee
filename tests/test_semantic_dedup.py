"""SemDeDup containment/recall properties vs the exact cosine structure.

The operator is approximate by construction (pairs split across clusters
are missed), so the oracle gate is rows-only; these tests pin the two
properties that make the approximation trustworthy:

  * soundness — every flagged duplicate really has a lower-id exact-cosine
    neighbor above the threshold, and `dup_of` is such a neighbor (no
    false positives, ever);
  * recall — the cluster blocking keeps a healthy fraction of the exact
    dup-eligible set (floor measured at 0.85 on this data; actual ~0.9+).
"""

from __future__ import annotations

import numpy as np
import pytest

from energy_datalake_solution_spark.operators.similarity import (
    embeddings_semantic_dedup,
)
from energy_datalake_solution_spark.sources.catalog import load_table

from .conftest import SF_ORACLE

THRESHOLD = 0.4  # must match SEMDEDUP_THRESHOLD in the operator
RECALL_FLOOR = 0.85


@pytest.fixture(scope="module")
def exact(spark):
    rows = (
        load_table(spark, SF_ORACLE, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r.vec_id)
    ids = np.array([r.vec_id for r in rows])
    x = np.stack([np.array(r.embedding, dtype=np.float64) for r in rows])
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    sims = x @ x.T
    pos = {int(v): i for i, v in enumerate(ids)}
    return ids, sims, pos


def test_semantic_dedup_sound_and_recalls(spark, exact):
    ids, sims, pos = exact
    out = {r.vec_id: r for r in embeddings_semantic_dedup(spark, SF_ORACLE).collect()}
    assert set(out) == set(int(v) for v in ids)  # exactly one row per vector

    flagged = {v for v, r in out.items() if r.is_dup}
    for v in flagged:
        r = out[v]
        assert r.dup_of < v  # lowest-id-wins orientation
        # the claimed representative really is an above-threshold neighbor
        assert sims[pos[v], pos[r.dup_of]] >= THRESHOLD
    for v, r in out.items():
        assert r.is_dup == (r.dup_of >= 0)

    eligible = {
        int(ids[i]) for i in range(len(ids)) if (sims[i, :i] >= THRESHOLD).any()
    }
    assert flagged <= eligible  # soundness at the set level too
    assert eligible, "test data lost its near-dup structure"
    recall = len(flagged) / len(eligible)
    assert recall >= RECALL_FLOOR, f"semantic dedup recall {recall:.3f}"
