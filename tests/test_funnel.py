"""Funnel analysis (operators/funnel.py): ordered-within-horizon
conversion vs a plain-Python replay of the same rule."""

from __future__ import annotations

import datetime

from mito_spark.engine import load_table
from mito_spark.operators.funnel import funnel_analysis


def test_funnel_matches_python_replay(spark, sf_dir):
    steps = ("view", "click", "purchase")
    within = datetime.timedelta(days=7)
    got = {r.step: (r.step_idx, r.n_users) for r in funnel_analysis(spark, sf_dir).collect()}

    events = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts")
        .collect()
    )
    by_user: dict = {}
    for r in events:
        if r.event_type in steps:
            by_user.setdefault(r.user_id, []).append((r.ts, r.event_type))
    counts = [0] * len(steps)
    for evs in by_user.values():
        evs.sort()
        t0 = next((t for t, e in evs if e == steps[0]), None)
        if t0 is None:
            continue
        counts[0] += 1
        deadline, prev = t0 + within, t0
        for i, s in enumerate(steps[1:], start=1):
            nxt = next((t for t, e in evs if e == s and prev < t <= deadline), None)
            if nxt is None:
                break
            counts[i] += 1
            prev = nxt
    assert got == {s: (i, counts[i]) for i, s in enumerate(steps)}
    # funnel is monotone by construction
    assert counts[0] >= counts[1] >= counts[2] > 0


def test_funnel_single_shuffle(spark, sf_dir):
    from mito_spark.operators.skew import explain_shuffle_count

    # groupBy(user_id) is the only exchange; the roll-up is a
    # single-partition aggregate over per-user rows
    assert explain_shuffle_count(funnel_analysis(spark, sf_dir)) <= 2


def test_events_value_anomalies_matches_python(spark, sf_dir):
    from mito_spark.engine import load_table
    from mito_spark.operators.events import events_value_anomalies

    got = {r.event_type: r for r in events_value_anomalies(spark, sf_dir).collect()}
    rows = load_table(spark, sf_dir, "events").select("event_type", "value").collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.value)
    for t, vals in by_type.items():
        n = len(vals)
        mean = sum(round(v, 9) for v in vals) / n
        var = max(sum(round(v * v, 9) for v in vals) / n - mean * mean, 0.0)
        std = var**0.5
        anom = sum(1 for v in vals if abs(v - mean) > 3.0 * std)
        g = got[t]
        assert g.n_events == n
        assert abs(g.mean_value - mean) < 1e-5
        assert abs(g.std_value - std) < 1e-5
        assert g.n_anomalies == anom
