"""Jaro-Winkler record linkage (functions/linkage.py): canonical values,
DuckDB parity, and the blocked distinct-pair builder."""

import random
import string

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pr2_transformation_spark.functions import linkage


def test_canonical_values():
    assert linkage.jaro_winkler_py("MARTHA", "MARHTA") == pytest.approx(
        0.9611111111111111
    )
    assert linkage.jaro_winkler_py("DWAYNE", "DUANE") == pytest.approx(0.84)
    assert linkage.jaro_winkler_py("abc", "abc") == 1.0
    assert linkage.jaro_winkler_py("abc", "xyz") == 0.0
    assert linkage.jaro_winkler_py("", "") == 0.0  # DuckDB's convention
    assert linkage.jaro_winkler_py("a", "") == 0.0


def test_duckdb_parity_random_pairs():
    """The whole point of the implementation: bit-identical agreement
    with DuckDB's jaro_winkler_similarity, so linkage queries can be
    oracle-graded.  2000 random pairs incl. empties and repeats."""
    con = duckdb.connect()
    rng = random.Random(42)
    for _ in range(2000):
        a = "".join(rng.choices(string.ascii_lowercase[:6], k=rng.randint(0, 12)))
        b = "".join(rng.choices(string.ascii_lowercase[:6], k=rng.randint(0, 12)))
        d = con.execute(
            "select jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert linkage.jaro_winkler_py(a, b) == pytest.approx(d, abs=1e-12), (a, b)


def test_blocked_pairs_distinct_and_thresholded(spark):
    df = spark.createDataFrame(
        [
            Row(name="small ring", block="ring"),
            Row(name="small ring", block="ring"),  # duplicate row collapses
            Row(name="smell ring", block="ring"),
            Row(name="large bolt", block="bolt"),
            Row(name="other ring", block="ring"),
        ]
    )
    out = linkage.blocked_name_pairs(
        df, "name", F.col("block"), min_similarity=0.8
    ).collect()
    pairs = {(r["name_a"], r["name_b"]): r["jw"] for r in out}
    # the near-identical pair survives; cross-block pairs never formed
    assert ("small ring", "smell ring") in pairs
    assert pairs[("small ring", "smell ring")] >= 0.8
    assert all(a != "large bolt" and b != "large bolt" for a, b in pairs)
    # duplicates collapsed: no self-pairs, each pair once
    assert len(pairs) == len(out)


def test_fellegi_sunter_weights_and_verdicts(spark):
    """u-probs from value frequencies, agreement weights positive,
    disagreement negative, and the total = sum of per-field weights."""
    import math

    from pyspark.sql import functions as F

    from pr2_transformation_spark.functions import linkage

    # one block; field 'x' half-half, field 'y' uniform over 4 values
    rows = [(i, 1, "a" if i < 4 else "b", str(i % 4)) for i in range(8)]
    df = spark.createDataFrame(rows, "id long, blk int, x string, y string")
    pairs = linkage.fellegi_sunter_pairs(
        df,
        id_col="id",
        block_cols=["blk"],
        compare_cols=["x", "y"],
        m_probs={"x": 0.9, "y": 0.8},
    ).collect()
    assert len(pairs) == 28  # C(8,2)

    u_x = (16 + 16) / 64.0  # 0.5
    u_y = 4 * 4 / 64.0  # 0.25
    wa_x, wd_x = round(math.log2(0.9 / u_x), 6), round(math.log2(0.1 / 0.5), 6)
    wa_y, wd_y = round(math.log2(0.8 / u_y), 6), round(math.log2(0.2 / 0.75), 6)
    for r in pairs:
        want = (wa_x if r["agree_x"] else wd_x) + (wa_y if r["agree_y"] else wd_y)
        assert abs(r["weight"] - round(want, 4)) < 1e-9
    # ids 0 and 4 share y (0%4 == 4%4) but not x
    m = {(r["id_a"], r["id_b"]): r for r in pairs}
    assert m[(0, 4)]["agree_y"] and not m[(0, 4)]["agree_x"]
    assert m[(0, 1)]["agree_x"] and not m[(0, 1)]["agree_y"]


def test_fellegi_sunter_profile_report_equals_pair_form(spark):
    """The closed-form profile report must aggregate to EXACTLY what the
    brute-force pair enumeration gives — counts, averages, extremes —
    across multiple blocks and thresholds."""
    from pyspark.sql import functions as F

    from pr2_transformation_spark.functions import linkage

    rows = [
        (i, i % 3, ["a", "b", "c"][i % 2 + (i % 5 == 0)], str(i % 4))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "id long, blk int, x string, y string")
    kw = dict(
        id_col="id",
        block_cols=["blk"],
        compare_cols=["x", "y"],
        m_probs={"x": 0.9, "y": 0.8},
    )
    for thresholds in [(1.0, -1.0), (0.5, -3.0)]:
        pairs = linkage.fellegi_sunter_pairs(df, **kw)
        hi, lo = thresholds
        verdict = (
            F.when(F.col("weight") >= hi, F.lit("match"))
            .when(F.col("weight") >= lo, F.lit("possible"))
            .otherwise(F.lit("nonmatch"))
        )
        brute = {
            r["verdict"]: (
                r["n_pairs"],
                r["avg_weight"],
                r["min_weight"],
                r["max_weight"],
            )
            for r in pairs.groupBy(verdict.alias("verdict"))
            .agg(
                F.count(F.lit(1)).alias("n_pairs"),
                F.round(F.avg("weight"), 4).alias("avg_weight"),
                F.min("weight").alias("min_weight"),
                F.max("weight").alias("max_weight"),
            )
            .collect()
        }
        closed = {
            r["verdict"]: (
                r["n_pairs"],
                r["avg_weight"],
                r["min_weight"],
                r["max_weight"],
            )
            for r in linkage.fellegi_sunter_profile_report(
                df, thresholds=thresholds, **kw
            ).collect()
        }
        assert set(brute) == set(closed)
        for v in brute:
            assert brute[v][0] == closed[v][0], v
            assert abs(brute[v][1] - closed[v][1]) < 1e-9, v
            assert brute[v][2] == closed[v][2] and brute[v][3] == closed[v][3], v


def test_fellegi_sunter_em_matches_bruteforce_reference(spark):
    """The distributed pattern-histogram EM must equal a brute-force
    reference: enumerate every blocked row pair in Python, histogram the
    agreement patterns, run the same 3 textbook EM updates, and compare
    parameters and derived log2 weights.  Plus sanity invariants: EM
    separates the planted duplicate structure (m > u per field) and the
    match proportion stays a probability."""
    import itertools
    import math

    from pr2_transformation_spark.functions import linkage

    # two blocks with planted near-duplicates: ids 2k/2k+1 agree on both
    # fields, cross pairs mostly disagree
    rows = []
    for i in range(10):
        blk = i % 2
        rows.append((2 * i, blk, f"n{i}", str(i % 3)))
        rows.append((2 * i + 1, blk, f"n{i}", str(i % 3)))
    df = spark.createDataFrame(rows, "id long, blk int, x string, y string")

    got = {
        r["field"]: r
        for r in linkage.fellegi_sunter_em(
            df,
            id_col="id",
            block_cols=["blk"],
            compare_cols=["x", "y"],
            iters=3,
        ).collect()
    }

    # brute-force reference
    byblk = {}
    for rid, blk, x, y in rows:
        byblk.setdefault(blk, []).append((rid, x, y))
    hist = {}
    for blk, rs in byblk.items():
        for (ia, xa, ya), (ib, xb, yb) in itertools.combinations(rs, 2):
            gam = (int(xa == xb), int(ya == yb))
            hist[gam] = hist.get(gam, 0.0) + 1.0
    p, m, u = 0.5, [0.9, 0.9], [0.1, 0.1]
    for _ in range(3):
        s_cnt = s_g = s_v = 0.0
        s_gf, s_vf = [0.0, 0.0], [0.0, 0.0]
        for gam, cnt in sorted(hist.items()):
            pm, pu = p, 1.0 - p
            for j in range(2):
                pm *= m[j] if gam[j] else 1.0 - m[j]
                pu *= u[j] if gam[j] else 1.0 - u[j]
            g = pm / (pm + pu)
            s_cnt += cnt
            s_g += cnt * g
            s_v += cnt * (1.0 - g)
            for j in range(2):
                if gam[j]:
                    s_gf[j] += cnt * g
                    s_vf[j] += cnt * (1.0 - g)
        p = round(s_g / s_cnt, 9)
        for j in range(2):
            m[j] = round(s_gf[j] / s_g, 9)
            u[j] = round(s_vf[j] / s_v, 9)

    for j, f in enumerate(["x", "y"]):
        assert abs(got[f]["m_em"] - round(m[j], 6)) < 1e-9, f
        assert abs(got[f]["u_em"] - round(u[j], 6)) < 1e-9, f
        assert abs(
            got[f]["w_agree"] - round(math.log2(m[j] / u[j]), 6)
        ) < 1e-9, f
        assert got[f]["m_em"] > got[f]["u_em"], f  # duplicates separated
        assert got[f]["w_agree"] > 0 > got[f]["w_disagree"], f
        assert 0.0 < got[f]["p_match"] < 1.0
        assert abs(got[f]["p_match"] - round(p, 6)) < 1e-9
