"""Timestamp parse/format with Go reference-time layouts (reference:
/root/reference/lib/time.go, doc :33-107; layout constants :153-171).

The reference formats/parses with Go layout strings ("2006-01-02
15:04:05"). Spark uses JDK DateTimeFormatter patterns, so we ship a
Go→JDK layout translation table and compile each layout once on the
driver; the per-row work is the built-in date_format/to_timestamp.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered longest-first so greedy scanning is unambiguous.
_GO_TO_JDK = [
    ("2006", "yyyy"),
    ("01", "MM"),
    ("02", "dd"),
    ("15", "HH"),
    ("03", "hh"),
    ("04", "mm"),
    ("05", "ss"),
    (".000000000", ".SSSSSSSSS"),
    (".000000", ".SSSSSS"),
    (".000", ".SSS"),
    (".999999999", "[.SSSSSSSSS]"),
    (".999999", "[.SSSSSS]"),
    (".999", "[.SSS]"),
    ("January", "MMMM"),
    ("Jan", "MMM"),
    ("Monday", "EEEE"),
    ("Mon", "EEE"),
    ("PM", "a"),
    ("pm", "a"),
    ("-07:00", "XXX"),
    ("-0700", "Z"),
    ("-07", "X"),
    ("Z07:00", "XXX"),
    ("Z0700", "Z"),
    ("MST", "zzz"),
    ("06", "yy"),
    ("_2", "d"),  # space-padded day: JDK has no space pad; 'd' ≈
    ("1", "M"),
    ("2", "d"),
    ("3", "h"),
    ("4", "m"),
    ("5", "s"),
]

# Named layouts mirrored from the reference's time_layout map
# (lib/time.go:153-171) — same names, Go stdlib values.
GO_LAYOUTS = {
    "Layout": "01/02 03:04:05PM '06 -0700",
    "ANSIC": "Mon Jan _2 15:04:05 2006",
    "UnixDate": "Mon Jan _2 15:04:05 MST 2006",
    "RubyDate": "Mon Jan 02 15:04:05 -0700 2006",
    "RFC822": "02 Jan 06 15:04 MST",
    "RFC822Z": "02 Jan 06 15:04 -0700",
    "RFC850": "Monday, 02-Jan-06 15:04:05 MST",
    "RFC1123": "Mon, 02 Jan 2006 15:04:05 MST",
    "RFC1123Z": "Mon, 02 Jan 2006 15:04:05 -0700",
    "RFC3339": "2006-01-02T15:04:05Z07:00",
    "RFC3339Nano": "2006-01-02T15:04:05.999999999Z07:00",
    "Kitchen": "3:04PM",
    "Stamp": "Jan _2 15:04:05",
    "StampMilli": "Jan _2 15:04:05.000",
    "StampMicro": "Jan _2 15:04:05.000000",
    "StampNano": "Jan _2 15:04:05.000000000",
    "DateTime": "2006-01-02 15:04:05",
    "DateOnly": "2006-01-02",
    "TimeOnly": "15:04:05",
}


def go_layout_to_jdk(layout: str) -> str:
    """Translate a Go reference-time layout to a JDK pattern.

    Greedy longest-match scan; unrecognized runs are emitted as quoted
    literals so punctuation and words survive verbatim.
    """
    layout = GO_LAYOUTS.get(layout, layout)
    out: list[str] = []
    lit: list[str] = []

    def flush() -> None:
        if lit:
            text = "".join(lit)
            out.append("'" + text.replace("'", "''") + "'" if any(c.isalpha() for c in text) else text)
            lit.clear()

    i = 0
    while i < len(layout):
        for go, jdk in _GO_TO_JDK:
            if layout.startswith(go, i):
                flush()
                out.append(jdk)
                i += len(go)
                break
        else:
            lit.append(layout[i])
            i += 1
    flush()
    return "".join(out)


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def format_time(ts, layout: str) -> Column:
    """``t.format(layout)`` (time.go:201-211) — Go layout, JVM-side
    date_format after driver-side layout translation."""
    return F.date_format(_c(ts), go_layout_to_jdk(layout))


def parse_time(s, layouts: str | list[str]) -> Column:
    """``s.parse_time(layout | [layouts])`` (time.go:213-248): first
    successful layout wins → coalesce of try_to_timestamp, one pass,
    no UDF."""
    if isinstance(layouts, str):
        layouts = [layouts]
    col = _c(s)
    attempts = [F.try_to_timestamp(col, F.lit(go_layout_to_jdk(l))) for l in layouts]
    return attempts[0] if len(attempts) == 1 else F.coalesce(*attempts)


def now_pinned() -> Column:
    """The reference's ``now`` global is pinned at evaluation start
    (time.go:151-152); Spark's current_timestamp() is likewise pinned
    per query — semantics align."""
    return F.current_timestamp()


def now_instant() -> Column:
    """``now()`` the *call-time* clock (time.go:194-199), as opposed to
    the evaluation-pinned ``now`` global (now_pinned): current_timestamp
    is query-constant in Spark, so the instant form needs a (cheap,
    scalar) pandas UDF reading the executor clock per batch."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("timestamp")
    def _clock(s):  # no annotations: local pd import breaks inference
        import pandas as pd

        now = pd.Timestamp.utcnow().tz_localize(None)
        return pd.Series([now] * len(s))

    from pyspark.sql import functions as F

    return _clock(F.lit(0))
