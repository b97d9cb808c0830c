"""The reference's continuation protocol, Spark-first.

Reference behavior (/root/reference/mito.go:186-204, demonstrated in
testdata/want_more.txt): evaluate the program on `state`; if the result
map carries `want_more: true`, feed the result back in as the next
state; repeat until false. Cursors are ordinary fields carried through
state (example.cel:28-34).

Spark mapping, two tiers:

- ``ContinuationDriver``: the literal protocol — a driver-side loop
  where each step is a full distributed computation
  (state: small dict) → plan → (state', DataFrame side-output).
  This is how paginated-source ingestion works: the cursor is tiny
  driver state; the per-step work is arbitrarily large and fully
  distributed. The loop itself costing O(steps) driver round-trips is
  inherent to the protocol (each page depends on the previous cursor).

- For per-key continuation at scale, the same protocol maps onto
  ``transformWithStateInPandas`` / ``applyInPandasWithState`` where
  the cursor lives in the state store, not on the driver — see
  mito_spark.streaming.stateful.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

# A step takes (spark, state) and returns the next state; by the
# reference's convention the state carries "want_more": bool. Any
# DataFrame results are written/accumulated by the step itself.
StepFn = Callable[[SparkSession, dict[str, Any]], dict[str, Any]]


@dataclass
class ContinuationDriver:
    """Run a step function under the want_more protocol.

    ``max_steps`` bounds runaway loops (the reference loops forever if
    the expression always sets want_more; a bound is the engine-side
    guard). Checkpointing the cursor between steps is the caller's
    choice via ``on_step``.
    """

    step: StepFn
    max_steps: int = 1000
    on_step: Callable[[int, dict[str, Any]], None] | None = None
    history: list[dict[str, Any]] = field(default_factory=list)

    def run(self, spark: SparkSession, initial_state: dict[str, Any]) -> dict[str, Any]:
        state = dict(initial_state)
        for i in range(self.max_steps):
            state = self.step(spark, state)
            self.history.append(state)
            if self.on_step is not None:
                self.on_step(i, state)
            if not state.get("want_more", False):
                return state
        raise RuntimeError(f"continuation did not terminate within {self.max_steps} steps")


def paginate_dataframe(
    spark: SparkSession,
    fetch_page: Callable[[SparkSession, dict[str, Any]], tuple[DataFrame, dict[str, Any]]],
    initial_cursor: dict[str, Any],
    max_pages: int = 1000,
) -> DataFrame:
    """Paginated-source helper over the continuation protocol: calls
    ``fetch_page(spark, cursor) -> (page_df, next_cursor)`` until the
    returned cursor lacks want_more, unioning pages lazily (no
    driver-side row materialization — union of lazy plans)."""
    pages: list[DataFrame] = []

    def step(s: SparkSession, cursor: dict[str, Any]) -> dict[str, Any]:
        df, nxt = fetch_page(s, cursor)
        pages.append(df)
        return nxt

    ContinuationDriver(step, max_steps=max_pages).run(spark, initial_cursor)
    if not pages:
        raise ValueError("fetch_page never produced a page")
    out = pages[0]
    for p in pages[1:]:
        out = out.unionByName(p)
    return out


def cursor_summary(df: DataFrame, ts_col: str = "timestamp") -> dict[str, Any]:
    """The reference's cursor convention (example.cel:28-34): first /
    last event-time summary, collected as tiny driver state. At scale
    the list member is capped (it exists for parity; a real cursor
    carries only the bounds)."""
    from pyspark.sql import functions as F

    row = df.agg(
        F.min(ts_col).alias("first"),
        F.max(ts_col).alias("last"),
    ).collect()[0]
    return {"timestamps": {"first": row["first"], "last": row["last"]}}
