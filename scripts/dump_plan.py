"""Dump .explain("formatted") for named queries() entries to
plans/$SPARK_GRAFT_PLAN_DIR/<query>_<suffix>.txt (judge-auditable plan
evidence; the plan dir defaults to the current round's directory).

Usage: python scripts/dump_plan.py <suffix> <query> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mito_spark.engine import get_spark


def _formatted_plan(df) -> str:
    # Prefer the stable-ish explainString on the Java QueryExecution;
    # fall back to capturing df.explain() if the private surface moves.
    try:
        return df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    except Exception:
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        return 2
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    spark = get_spark("dump_plan")
    spark.sparkContext.setLogLevel("ERROR")
    plan_dir = os.environ.get("SPARK_GRAFT_PLAN_DIR", "r13")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", plan_dir
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = _formatted_plan(df)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
