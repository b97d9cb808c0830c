"""Pipeline-spec compiler + CLI: the reference's entry-point contract
(compile once / evaluate per batch, JSON in → JSON out, want_more loop)
re-expressed over Catalyst (mito.go:59-206, :300-306, :186-204)."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest

from mito_spark.plans.pipeline_spec import SpecError, compile_pipeline


def _doc_df(spark, doc):
    return spark.read.json(spark.sparkContext.parallelize([json.dumps(doc)]))


def test_compile_once_eval_many(spark):
    """One compiled pipeline, two different batches — the embedding
    contract."""
    pipe = compile_pipeline(
        {
            "ops": [
                {"op": "filter", "expr": "value > 10"},
                {"op": "with", "exprs": {"doubled": "value * 2"}},
                {"op": "select", "exprs": {"k": "k", "doubled": "doubled"}},
            ]
        }
    )
    a = pipe(_doc_df(spark, [{"k": "x", "value": 5}, {"k": "y", "value": 20}]))
    b = pipe(_doc_df(spark, [{"k": "z", "value": 11}]))
    assert [r.asDict() for r in a.collect()] == [{"k": "y", "doubled": 40}]
    assert [r.asDict() for r in b.collect()] == [{"k": "z", "doubled": 22}]


def test_explode_group_order_limit(spark):
    """The README-example shape: comprehension (explode) → aggregate."""
    pipe = compile_pipeline(
        {
            "ops": [
                {"op": "explode", "column": "nums", "as": "n"},
                {"op": "group_agg", "keys": ["tag"], "aggs": {"total": "sum(n)", "c": "count(*)"}},
                {"op": "order_by", "exprs": ["total DESC"]},
                {"op": "limit", "n": 1},
            ]
        }
    )
    out = pipe(
        _doc_df(
            spark,
            [{"tag": "a", "nums": [1, 2, 3]}, {"tag": "b", "nums": [10, 20]}],
        )
    )
    assert [r.asDict() for r in out.collect()] == [{"tag": "b", "total": 30, "c": 2}]


def test_sql_escape_hatch(spark):
    pipe = compile_pipeline(
        {"ops": [{"op": "sql", "query": "SELECT count(*) AS n FROM __this__ WHERE v % 2 = 0"}]}
    )
    out = pipe(_doc_df(spark, [{"v": i} for i in range(10)]))
    assert out.first().n == 5


def test_unknown_op_fails_at_compile_time():
    with pytest.raises(SpecError):
        compile_pipeline({"ops": [{"op": "nope"}]})
    with pytest.raises(SpecError):
        compile_pipeline({"not_ops": []})


def test_cli_end_to_end(tmp_path):
    """Real subprocess through python -m mito_spark, like the
    reference's testscript harness running the mito CLI."""
    data = tmp_path / "state.json"
    data.write_text(json.dumps([{"tag": "a", "v": 1}, {"tag": "b", "v": 9}]))
    spec = tmp_path / "pipe.json"
    spec.write_text(
        json.dumps(
            {
                "ops": [
                    {"op": "filter", "expr": "v > 3"},
                    {"op": "select", "exprs": {"tag": "tag", "vv": "v * v"}},
                ]
            }
        )
    )
    r = subprocess.run(
        [sys.executable, "-m", "mito_spark", "-data", str(data), "-pipeline", str(spec)],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout) == [{"tag": "b", "vv": 81}]


def test_cli_want_more_loop(tmp_path):
    """Continuation: state carries a counter; want_more until n >= 3
    (reference testdata/want_more.txt shape)."""
    data = tmp_path / "state.json"
    data.write_text(json.dumps({"n": 0, "want_more": True}))
    spec = tmp_path / "pipe.json"
    spec.write_text(
        json.dumps({"ops": [{"op": "select", "exprs": {"n": "n + 1", "want_more": "n + 1 < 3"}}]})
    )
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "mito_spark",
            "-data",
            str(data),
            "-pipeline",
            str(spec),
            "--continuation",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout) == [{"n": 3, "want_more": False}]


def test_curriculum_plan_orders_phases_by_difficulty(spark, tmp_path):
    """Phases must be difficulty-ordered and populated on a corpus
    with clearly tiered surprisal: common-word docs land in early
    phases, rare-word docs in late ones; mean difficulty is strictly
    monotone and the doc count is preserved."""
    from pyspark.sql import functions as F

    from mito_spark.operators.pipeline import curriculum_plan

    rows = []
    for i in range(40):
        rows.append((i, "common words repeated here " * 10))
    for i in range(40, 60):
        rows.append((i, f"rare{i} unusual{i} singleton{i} token{i}"))
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{d}/documents.parquet")
    out = curriculum_plan(spark, d).collect()
    assert sum(r.n_docs for r in out) == 60
    means = [r.mean_difficulty for r in out]
    assert means == sorted(means)
    assert len(means) >= 2
    # range columns are bucket-disjoint: phase i's max difficulty
    # never exceeds phase i+1's min
    for a, b in zip(out, out[1:]):
        assert a.d_hi <= b.d_lo + 1e-9
