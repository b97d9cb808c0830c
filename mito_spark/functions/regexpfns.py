"""Named-regexp functions (reference: /root/reference/lib/regexp.go,
doc :31-116; registry :117-121).

The reference precompiles named patterns from config — an injection-
safety design we keep: a ``RegexpRegistry`` maps name → pattern, and
expression builders reference patterns by name. Patterns are validated
on the driver for RE2↔Java dialect compatibility (the reference is Go
RE2; Spark is java.util.regex) — constructs that differ (backreferences,
lookarounds exist in Java but not RE2; RE2's ``(?P<name>``) are
translated or rejected up front instead of failing on executors.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_RE2_ONLY = re.compile(r"\(\?P<")  # RE2 named group → Java (?<name>...)
_JAVA_UNSUPPORTED_IN_RE2 = re.compile(r"\\[0-9]|\(\?<?[=!]")  # backrefs, lookaround


class RegexpRegistry:
    """name → pattern table (regexp.go:117-121). ``strict`` rejects
    patterns whose semantics would differ between RE2 and Java."""

    def __init__(self, patterns: dict[str, str], strict: bool = True):
        self.patterns: dict[str, str] = {}
        for name, pat in patterns.items():
            if strict and _JAVA_UNSUPPORTED_IN_RE2.search(pat):
                raise ValueError(
                    f"pattern {name!r} uses constructs outside the RE2/Java common "
                    f"subset: {pat!r}"
                )
            # driver-side validation on the source (RE2-style) pattern;
            # executors never see a bad pattern. The Java translation
            # only renames (?P<x> → (?<x>, which Python re can't parse.
            re.compile(pat)
            self.patterns[name] = _RE2_ONLY.sub("(?<", pat)

    def _get(self, name: str) -> str:
        if name not in self.patterns:
            raise KeyError(f"no regexp named {name!r} registered")
        return self.patterns[name]

    def _c(self, x) -> Column:
        return F.col(x) if isinstance(x, str) else x

    def re_match(self, name: str, s) -> Column:
        """``s.re_match(name)`` (regexp.go:218) → rlike (unanchored
        containment, matching Go's Regexp.Match)."""
        return self._c(s).rlike(self._get(name))

    def re_find(self, name: str, s) -> Column:
        """First match, NULL if none (regexp.go:237)."""
        pat = self._get(name)
        found = F.regexp_extract(self._c(s), "(" + pat + ")", 1)
        return F.when(self._c(s).rlike(pat), found)

    def re_find_all(self, name: str, s) -> Column:
        """All matches as array (regexp.go:256)."""
        return F.regexp_extract_all(self._c(s), F.lit("(" + self._get(name) + ")"), F.lit(1))

    def re_find_submatch(self, name: str, s) -> Column:
        """Whole match + capture groups of the first match → array
        (regexp.go:275)."""
        pat = self._get(name)
        ngroups = re.compile(pat).groups
        col = self._c(s)
        parts = [F.regexp_extract(col, "(" + pat + ")", 1)] + [
            F.regexp_extract(col, pat, i + 1) for i in range(ngroups)
        ]
        return F.when(col.rlike(pat), F.array(*parts))

    def re_find_all_submatch(self, name: str, s) -> Column:
        """Whole match + capture groups for EVERY match → array of
        arrays (regexp.go:294): per-group regexp_extract_all runs are
        zipped positionally — the i-th full match aligns with the i-th
        extraction of each group because extraction order is document
        order in both engines."""
        pat = self._get(name)
        ngroups = re.compile(pat).groups
        col = self._c(s)
        per_group = [F.regexp_extract_all(col, F.lit("(" + pat + ")"), F.lit(1))] + [
            F.regexp_extract_all(col, F.lit(pat), F.lit(i + 1)) for i in range(ngroups)
        ]
        idx = F.sequence(F.lit(1), F.size(per_group[0]))
        return F.transform(
            idx, lambda i: F.array(*[F.element_at(g, i) for g in per_group])
        )

    def re_replace_all(self, name: str, s, replacement: str) -> Column:
        """Replace all matches; ``${1}``/``$1`` group refs supported —
        both Go and Java use $-refs (regexp.go:313-341)."""
        return F.regexp_replace(self._c(s), self._get(name), replacement)
