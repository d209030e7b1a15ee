"""Fuzzy edit-distance join: lossless blocking vs brute force.

The oracle gate proves value parity with the declarative theta-join; this
pins the BLOCKING claim — the length-band equi-join plus threshold verify
finds exactly the brute-force pair set — and the plan claim (equi-join,
no cartesian product, no Python UDF).
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from energy_datalake_solution_spark.operators.fuzzy import (
    EDIT_K,
    parts_fuzzy_name_pairs,
)
from energy_datalake_solution_spark.sources.catalog import load_table

from .conftest import SF_ORACLE


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_join_lossless_vs_brute_force(spark):
    names = sorted(
        r.p_name
        for r in load_table(spark, SF_ORACLE, "part").select("p_name").distinct().collect()
    )
    expected = {
        (a, b, _levenshtein(a, b))
        for i, a in enumerate(names)
        for b in names[i + 1 :]
        if _levenshtein(a, b) <= EDIT_K
    }
    got = {
        (r.name_a, r.name_b, r.edit_distance)
        for r in parts_fuzzy_name_pairs(spark, SF_ORACLE).collect()
    }
    assert expected, "test data lost its fuzzy-name structure"
    assert got == expected


def test_fuzzy_join_plan_equi_only(spark):
    df = parts_fuzzy_name_pairs(spark, SF_ORACLE)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Python" not in plan  # levenshtein is JVM codegen
