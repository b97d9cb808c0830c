"""Z-order layout writer (sources/sinks.py): per-file footer stats
must be tight on BOTH curve columns — the property file pruning needs."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from mito_spark.engine import load_table
from mito_spark.sources.sinks import zorder_write


def _file_ranges(path: str, col: str) -> list[tuple[float, float]]:
    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.row_group(rg).num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        out.append((float(lo), float(hi)))
    return out


def _coverage(ranges: list[tuple[float, float]]) -> float:
    """Mean fraction of the global value span each file's range covers
    (1.0 = every file spans everything = zero pruning power)."""
    glo = min(r[0] for r in ranges)
    ghi = max(r[1] for r in ranges)
    span = (ghi - glo) or 1.0
    return sum((hi - lo) / span for lo, hi in ranges) / len(ranges)


def test_zorder_tightens_both_columns(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")

    naive = str(tmp_path / "naive")
    # naive comparison layout: range-sorted by user_id ONLY
    ev.repartitionByRange(8, "user_id").write.parquet(naive)
    z = str(tmp_path / "zorder")
    zorder_write(ev, z, ("user_id", "value"), n_files=8)

    # the single-key layout is tight on its key and useless on value
    naive_user = _coverage(_file_ranges(naive, "user_id"))
    naive_value = _coverage(_file_ranges(naive, "value"))
    z_user = _coverage(_file_ranges(z, "user_id"))
    z_value = _coverage(_file_ranges(z, "value"))

    assert naive_user < 0.25  # sanity: sorted key is tight
    assert naive_value > 0.6  # and the other column spans most values
    # z-order: BOTH columns materially tighter than the naive layout's
    # non-key column — each file covers a bounded curve rectangle
    assert z_user < 0.6 and z_value < 0.6
    assert z_value < naive_value * 0.8  # real pruning win on the 2nd col
    # no rows lost
    assert spark.read.parquet(z).count() == ev.count()
