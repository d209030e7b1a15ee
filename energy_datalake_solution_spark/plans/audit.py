"""Physical-plan audit: turn `explain` output into queryable metrics.

tests/test_plan_shapes.py pins individual plan invariants; this module is
the RUNTIME form of that discipline — an operator a user (or a CI gate)
can point at any registered query to get the scale-relevant facts of its
physical plan as data: how many exchanges, which joins broadcast vs
shuffle, whether anything degenerated into a cartesian product, what the
scans actually read and push down. At 100 TB this is the first thing you
check before launching a query fleet-wide: a plan with an unexpected
SortMergeJoin where a broadcast belongs, or a scan whose ReadSchema lists
30 columns for a 3-column projection, costs real money.

Implementation note: metrics come from the formatted explain string (the
stable public surface of the physical plan, same text the plan tests
assert on). Each node renders once in the tree header and once in the
detail section, so node counts divide detail-section occurrences — the
parser counts `(n) NodeName` detail headers, which are unique per node.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanAudit:
    n_scans: int = 0
    n_exchanges: int = 0
    n_broadcast_joins: int = 0
    n_sortmerge_joins: int = 0
    n_shuffled_hash_joins: int = 0
    n_nested_loop_joins: int = 0
    n_cartesian: int = 0
    n_windows: int = 0
    n_aggregates: int = 0
    has_topk: bool = False
    single_partition_exchange: bool = False
    read_columns: tuple[str, ...] = field(default_factory=tuple)
    pushed_filters: tuple[str, ...] = field(default_factory=tuple)

    @property
    def shuffle_joins(self) -> int:
        return self.n_sortmerge_joins + self.n_shuffled_hash_joins

    def violations(self, *, max_exchanges: int | None = None,
                   forbid_cartesian: bool = True,
                   forbid_single_partition: bool = False) -> list[str]:
        """Scale-policy check: returns human-readable violations (empty =
        clean). The defaults encode the invariants every query in this
        engine must hold; callers tighten per-query."""
        out = []
        if forbid_cartesian and self.n_cartesian:
            out.append(f"{self.n_cartesian} CartesianProduct node(s)")
        if max_exchanges is not None and self.n_exchanges > max_exchanges:
            out.append(f"{self.n_exchanges} exchanges > budget {max_exchanges}")
        if forbid_single_partition and self.single_partition_exchange:
            out.append("SinglePartition exchange (global serialization point)")
        return out


_NODE = re.compile(r"^\(\d+\) (\w[\w ]*?)(?: \[codegen id : \d+\])?$", re.M)


def audit_plan(df: DataFrame) -> PlanAudit:
    """Parse `df.explain("formatted")` into a PlanAudit."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()

    a = PlanAudit()
    for name in _NODE.findall(text):
        n = name.strip()
        if n.startswith("Scan "):
            a.n_scans += 1
        elif n == "Exchange":
            a.n_exchanges += 1
        elif n.startswith("BroadcastHashJoin"):
            a.n_broadcast_joins += 1
        elif n.startswith("SortMergeJoin"):
            a.n_sortmerge_joins += 1
        elif n.startswith("ShuffledHashJoin"):
            a.n_shuffled_hash_joins += 1
        elif n.startswith("BroadcastNestedLoopJoin"):
            a.n_nested_loop_joins += 1
        elif n.startswith("CartesianProduct"):
            a.n_cartesian += 1
        elif n == "Window":
            # WindowGroupLimit (rank-limit pushdown) renders as TWO extra
            # nodes (Partial + Final) around the same logical window —
            # counting them tripled n_windows for rank<=k queries and made
            # the metric incomparable across plans
            a.n_windows += 1
        elif "HashAggregate" in n or n == "SortAggregate":
            a.n_aggregates += 1
        elif n.startswith("TakeOrderedAndProject"):
            a.has_topk = True
    a.single_partition_exchange = "SinglePartition" in text

    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        cols.extend(p.split(":")[0] for p in m.group(1).split(",") if ":" in p)
    a.read_columns = tuple(sorted(set(cols)))
    pushed: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        pushed.extend(_split_filters(m.group(1)))
    a.pushed_filters = tuple(pushed)
    return a


def _split_filters(blob: str) -> list[str]:
    """Split a PushedFilters list on TOP-LEVEL commas only: a naive split
    shreds comparison filters whose arguments contain commas —
    GreaterThan(c_acctbal,0.0) became two garbage fragments."""
    out, depth, cur = [], 0, []
    for ch in blob:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            tok = "".join(cur).strip()
            if tok:
                out.append(tok)
            cur = []
        else:
            cur.append(ch)
    tok = "".join(cur).strip()
    if tok:
        out.append(tok)
    return out


def audit_query(spark, name: str, sf_dir: str) -> PlanAudit:
    """Audit a registered query by name."""
    from .registry import QUERIES, get_queries

    get_queries()
    return audit_plan(QUERIES[name].fn(spark, sf_dir))
