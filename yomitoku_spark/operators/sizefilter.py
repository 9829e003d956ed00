"""Size-distribution outlier filtering — the ruby (furigana) filter.

The reference drops tiny annotation fragments by thresholding the
per-page word-size distribution (/root/reference/src/yomitoku/
document_analyzer.py:69-188): a log-size histogram is searched for a
bimodal valley; if the distribution isn't bimodal it falls back to a
median − k·MAD threshold (`_mad_threshold` :73-92).

Spark decomposition:

* :func:`mad_outliers` — the MAD fallback as PURE AGGREGATIONS (exact
  percentile + conditional join back), fully SQL-expressible;
* :func:`valley_threshold_numpy` — the histogram valley split as numpy
  (per-group, used inside a grouped pandas UDF by
  :func:`ruby_filter_blocks` — groups are page/turn-sized, O(10²)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mad_outliers(
    df: DataFrame, group_cols: list[str], value_col: str, k: float = 3.0
) -> DataFrame:
    """Flag rows whose value deviates from the group median by more than
    k·MAD (median absolute deviation). Exact percentiles, two hash
    aggregations + one broadcastable join back — no UDF."""
    med = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("__med")
    )
    j = df.join(F.broadcast(med), group_cols)
    mad = j.groupBy(*group_cols).agg(
        F.expr(f"percentile(abs({value_col} - __med), 0.5)").alias("__mad")
    )
    out = j.join(F.broadcast(mad), group_cols)
    return out.withColumn(
        "is_outlier",
        F.abs(F.col(value_col) - F.col("__med")) > k * F.greatest(F.col("__mad"), F.lit(1e-12)),
    ).drop("__med", "__mad")


def valley_threshold_numpy(sizes: np.ndarray, n_bins: int = 16) -> float | None:
    """Bimodal log-histogram valley split (reference
    `_compute_ruby_threshold`, document_analyzer.py:95-152 semantics):
    histogram log(sizes); find the deepest interior valley separating
    two peaks; return the size threshold at that valley, or None when
    the distribution isn't bimodal."""
    sizes = np.asarray(sizes, dtype=np.float64)
    sizes = sizes[sizes > 0]
    if len(sizes) < 8:
        return None
    logs = np.log(sizes)
    lo, hi = logs.min(), logs.max()
    if hi - lo < 1e-9:
        return None
    hist, edges = np.histogram(logs, bins=n_bins, range=(lo, hi))
    best = None
    for v in range(1, n_bins - 1):
        left_peak = hist[:v].max()
        right_peak = hist[v + 1 :].max()
        if hist[v] < 0.5 * min(left_peak, right_peak) and left_peak > 0 and right_peak > 0:
            depth = min(left_peak, right_peak) - hist[v]
            if best is None or depth > best[0]:
                best = (depth, v)
    if best is None:
        return None
    return float(np.exp(edges[best[1] + 1]))


def ruby_filter_blocks(
    df: DataFrame,
    group_cols: list[str],
    size_col: str,
    text_col: str,
    kana_only_re: str = "^[ぁ-ゟァ-ヿ]+$",
) -> DataFrame:
    """Drop kana-only fragments below the per-group size threshold
    (valley split, MAD − 3σ fallback) — the full reference semantics.
    Adds a boolean ``is_ruby`` column."""

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        sizes = pdf[size_col].to_numpy()
        thr = valley_threshold_numpy(sizes)
        if thr is None:
            med = float(np.median(sizes))
            mad = float(np.median(np.abs(sizes - med)))
            thr = med - 3.0 * max(mad, 1e-12)
        small = pdf[size_col].to_numpy() < thr
        kana = pdf[text_col].str.match(kana_only_re).fillna(False).to_numpy()
        return pdf.assign(is_ruby=small & kana)

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.groupBy(*group_cols).applyInPandas(
        per_group, schema=f"{fields}, is_ruby boolean"
    )
