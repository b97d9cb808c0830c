"""CLI entry point: ``python -m mito_spark -data state.json -pipeline spec.json``.

Mirrors the reference's primary entry point (/root/reference/mito.go:59-206:
``mito -data state.json src.cel`` → pretty JSON on stdout), Spark-first:
the program is a declarative pipeline spec (plans/pipeline_spec.py)
compiled once, the data is a JSON document (an object → one row; a list
of events → one row per event, the reference's message-stream
convention, SURVEY §1.1), and the result prints as pretty JSON.

``--continuation`` runs the want_more protocol (mito.go:186-204): while
the single-row result carries ``want_more: true``, the output is fed
back as the next input state.
"""

from __future__ import annotations

import argparse
import json
import sys


def _read_doc(spark, path: str, fmt: str):
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "csv":
        return spark.read.option("header", True).csv(path)
    if fmt == "ndjson":
        return spark.read.json(path)
    # whole-file JSON value: object → 1 row, array → row per element
    return spark.read.option("multiLine", True).json(path)


def _doc_df(spark, doc):
    return spark.read.json(spark.sparkContext.parallelize([json.dumps(doc)]))


def _rows(df) -> list[dict]:
    return [json.loads(s) for s in df.toJSON().collect()]


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="mito_spark")
    p.add_argument("-data", required=True, help="input document / dataset path")
    p.add_argument("-pipeline", required=True, help="pipeline spec JSON path")
    p.add_argument("-format", default="json", choices=["json", "ndjson", "csv", "parquet"])
    p.add_argument("--continuation", action="store_true", help="run the want_more loop")
    p.add_argument("--max-steps", type=int, default=100)
    args = p.parse_args(argv)

    from mito_spark.engine import get_spark
    from mito_spark.plans.pipeline_spec import compile_pipeline

    with open(args.pipeline) as f:
        pipeline = compile_pipeline(f.read())  # compile once (mito.go:300-306)

    spark = get_spark("mito_spark_cli")
    spark.sparkContext.setLogLevel("ERROR")
    df = _read_doc(spark, args.data, args.format)

    if not args.continuation:
        print(json.dumps(_rows(pipeline(df)), indent=2))
        return 0

    # want_more loop: state' = eval(state); stop when want_more is falsy
    out: list[dict] = []
    state_df = df
    for _ in range(args.max_steps):
        rows = _rows(pipeline(state_df))
        if not rows:
            break
        state = rows[0]
        out = rows
        if not state.get("want_more"):
            break
        state_df = _doc_df(spark, state)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
