"""Docs-vs-registry freshness guards."""

from __future__ import annotations

import os


def test_operators_md_covers_registry():
    """docs/OPERATORS.md must list every queries() operator — the
    reference doc is generated; this guard fails the build the moment
    a new operator lands without regenerating it."""
    import __spark_entry__ as entry

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "OPERATORS.md")
    text = open(path).read()
    missing = [n for n in entry.queries() if f"`{n}`" not in text]
    assert not missing, f"regenerate docs/OPERATORS.md; missing: {missing}"


def test_readme_operator_count_matches():
    import re

    import __spark_entry__ as entry

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "README.md")
    m = re.search(r"`queries\(\)` \((\d+) operators\)", open(path).read())
    assert m and int(m.group(1)) == len(entry.queries())
