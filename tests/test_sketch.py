"""Portable mergeable HLL sketch (functions/sketch.py) vs an
independent scalar referee — register construction, merge laws,
fixed-point estimate, and accuracy bounds."""

import hashlib

import pytest
from pyspark.sql import functions as F

from yomitoku_spark.functions import sketch as SK
from yomitoku_spark.operators.retrieval import plog2q_frag

P = 8
M = 1 << P
WBITS = 60 - P


def _h60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _scalar_registers(values):
    regs = {}
    for v in values:
        h = _h60(v)
        b, w = h % M, h // M
        rho = WBITS + 1 if w == 0 else WBITS + 1 - w.bit_length()
        regs[b] = max(regs.get(b, 0), rho)
    return regs


def _scalar_plog2q(x):
    # micro-log2 with quadratic octave interpolation
    e = x.bit_length() - 1
    p = 1 << e
    f = (1000000 * (x - p)) // p
    return 1000000 * e + f + (347 * f * (1000000 - f)) // 1000000000


def _scalar_estimate(regs):
    n_nonzero = len(regs)
    sum_rho = sum(regs.values())
    s = sum((1 << 30) // (1 << r) for r in regs.values())
    s += (M - n_nonzero) * (1 << 30)
    raw = ((SK.ALPHA_MICRO[P] * M * M // 1000) * (1 << 30)) // max(s, 1)
    if n_nonzero < M and raw <= 2500 * M:
        ratio = (M * (1 << 20)) // max(M - n_nonzero, 1)
        ln_micro = (_scalar_plog2q(ratio) - 20000000) * SK.LN2_MICRO // 1000000
        est = M * ln_micro // 1000
    else:
        est = raw
    return n_nonzero, sum_rho, est


def _values_df(spark, groups):
    rows = [(g, v) for g, vals in groups.items() for v in vals]
    return spark.createDataFrame(rows, "grp string, val string")


def _engine_estimate(spark, groups):
    d = _values_df(spark, groups)
    regs = SK.hll_registers(d, F.col("val"), ["grp"], p=P)
    return {
        r.grp: (r.n_nonzero, r.sum_rho, r.est_milli)
        for r in SK.hll_estimate(regs, ["grp"], p=P).collect()
    }


def test_registers_match_scalar(spark):
    groups = {"a": [f"tok{i}" for i in range(40)], "b": ["x"], "c": []}
    d = _values_df(spark, groups)
    got = {
        (r.grp, r.bucket): r.rho
        for r in SK.hll_registers(d, F.col("val"), ["grp"], p=P).collect()
    }
    want = {}
    for g, vals in groups.items():
        for b, rho in _scalar_registers(vals).items():
            want[(g, b)] = rho
    assert got == want


@pytest.mark.parametrize("n", [1, 10, 100, 1000, 20000])
def test_estimate_matches_scalar_and_is_accurate(spark, n):
    vals = [f"item-{i}" for i in range(n)]
    got = _engine_estimate(spark, {"g": vals})["g"]
    assert got == _scalar_estimate(_scalar_registers(vals))
    est = got[2] / 1000
    # p=8 HLL standard error is 1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert abs(est - n) / n < 0.20, (n, est)


def test_merge_laws(spark):
    """Sharded build + merge == whole-corpus build (associative,
    commutative, idempotent)."""
    vals = [f"v{i}" for i in range(500)]
    whole = _engine_estimate(spark, {"g": vals})
    d1 = _values_df(spark, {"g": vals[:300]})
    d2 = _values_df(spark, {"g": vals[250:]})  # overlap: idempotence
    r1 = SK.hll_registers(d1, F.col("val"), ["grp"], p=P)
    r2 = SK.hll_registers(d2, F.col("val"), ["grp"], p=P)
    for union in (r1.unionByName(r2), r2.unionByName(r1)):
        merged = SK.hll_merge(union, ["grp"])
        got = {
            r.grp: (r.n_nonzero, r.sum_rho, r.est_milli)
            for r in SK.hll_estimate(merged, ["grp"], p=P).collect()
        }
        assert got == whole


def test_plog2q_spark_duckdb_scalar_parity(spark):
    import duckdb

    xs = [1, 2, 3, 1023, 1024, 10**6, 2**28, (M * (1 << 20)) // 7]
    got_spark = [
        r.v
        for r in spark.createDataFrame([(x,) for x in xs], "x long")
        .select(F.expr(plog2q_frag("x", "spark")).alias("v"))
        .collect()
    ]
    frag = plog2q_frag("x", "duckdb")
    got_duck = [
        duckdb.sql(f"SELECT {frag} AS v FROM (VALUES ({x}),) t(x)").fetchone()[0]
        for x in xs
    ]
    want = [_scalar_plog2q(x) for x in xs]
    assert got_spark == want
    assert got_duck == want


def test_register_table_is_bounded(spark):
    """The mergeable artifact never exceeds m rows per group no matter
    the input cardinality — the property that makes it shippable."""
    vals = [f"u{i}" for i in range(50000)]
    regs = SK.hll_registers(
        _values_df(spark, {"g": vals}), F.col("val"), ["grp"], p=P
    )
    assert regs.count() <= M
