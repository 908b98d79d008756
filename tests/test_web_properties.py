"""Property-based invariants for the web-ingestion and audio-codec
surfaces added in round 3.  Driver-side only — no SparkSession (the
Spark plumbing is covered by test_web/test_multimodal; these pin the
pure-Python halves over adversarial inputs)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pr2_transformation_spark.functions import linkage, multimodal
from pr2_transformation_spark.sources import warc

# -------------------------------------------------------------- WARC ----

payloads = st.lists(st.binary(max_size=200), min_size=1, max_size=8)


@settings(max_examples=60, deadline=None)
@given(payloads)
def test_warc_round_trip_arbitrary_binary(bodies):
    """build -> parse recovers every payload byte-for-byte, including
    bodies that CONTAIN the CRLF CRLF record separator — Content-Length
    framing, not delimiter scanning, must drive the walk."""
    recs = [
        ("response", f"https://x.example/{i}", f"urn:p:{i}", b)
        for i, b in enumerate(bodies)
    ]
    parsed = warc.parse_warc(warc.build_warc(recs))
    assert [r["content"] for r in parsed] == bodies
    assert [r["record_id"] for r in parsed] == [f"urn:p:{i}" for i in range(len(bodies))]


@settings(max_examples=40, deadline=None)
@given(payloads, st.integers(0, 3))
def test_warc_truncation_never_silently_drops(bodies, cut):
    """Any truncation INSIDE the final record raises — a parser that
    returns fewer records than written would silently lose crawl data."""
    blob = warc.build_warc(
        [("response", "u", f"urn:p:{i}", b) for i, b in enumerate(bodies)]
    )
    cut_blob = blob[: len(blob) - 1 - cut]
    try:
        parsed = warc.parse_warc(cut_blob)
    except ValueError:
        return
    assert len(parsed) < len(bodies)  # only whole-record prefixes may parse


# -------------------------------------------------------------- G.711 ----

@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=300))
def test_mulaw_error_bound_random_samples(vals):
    s = np.array(vals, dtype=np.int16)
    d = multimodal.mulaw_decode(multimodal.mulaw_encode(s)).astype(np.int64)
    clamped = np.clip(s.astype(np.int64), -32635, 32635)
    assert np.abs(d - clamped).max() <= 512


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(-32768, 32767), min_size=2, max_size=400))
def test_ima_adpcm_decoder_tracks_encoder(vals):
    """Decode is a pure function of the nibble stream: re-decoding the
    same bytes twice is identical, and the output length contract holds
    for odd sample counts (padded nibble)."""
    s = np.array(vals, dtype=np.int16)
    enc = multimodal.ima_adpcm_encode(s)
    assert len(enc) == (len(s) + 1) // 2
    d1 = multimodal.ima_adpcm_decode(enc, len(s))
    d2 = multimodal.ima_adpcm_decode(enc, len(s))
    assert np.array_equal(d1, d2)
    assert d1.dtype == np.int16 and len(d1) == len(s)


# ------------------------------------------------------------ linkage ----

@settings(max_examples=150, deadline=None)
@given(st.text(max_size=12), st.text(max_size=12))
def test_jaro_winkler_metric_properties(a, b):
    jw = linkage.jaro_winkler_py
    assert 0.0 <= jw(a, b) <= 1.0
    assert jw(a, b) == jw(b, a)  # symmetry
    if a and a == b:
        assert jw(a, b) == 1.0


def test_clean_unicode_folds_every_class(spark):
    from pr2_transformation_spark.functions.textstats import clean_unicode
    import pyspark.sql.functions as F

    dirty = (
        "\ufeff\u201cSm\u2018art\u2019\u0007 te\u200bxt\u2014now"
        "\u00a0\u00a0done\u2026\u201d  end"
    )
    df = spark.createDataFrame([(dirty,)], "t string")
    [row] = df.select(clean_unicode(F.col("t")).alias("c")).collect()
    assert row["c"] == '"Sm\'art\' text-now done..." end'


def test_clean_unicode_idempotent_and_ascii_stable(spark):
    from pr2_transformation_spark.functions.textstats import clean_unicode
    import pyspark.sql.functions as F

    clean = "plain ascii text, already clean."
    df = spark.createDataFrame([(clean,)], "t string")
    [row] = df.select(
        clean_unicode(F.col("t")).alias("c1"),
        clean_unicode(clean_unicode(F.col("t"))).alias("c2"),
    ).collect()
    assert row["c1"] == clean and row["c2"] == clean


from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(st.text(min_size=0, max_size=120))
def test_clean_unicode_idempotent_property(spark, s):
    """clean_unicode(clean_unicode(x)) == clean_unicode(x) for arbitrary
    unicode input, and the output never contains a folded character."""
    from pr2_transformation_spark.functions.textstats import clean_unicode
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(s,)], "t string")
    [row] = df.select(
        clean_unicode(F.col("t")).alias("c1"),
        clean_unicode(clean_unicode(F.col("t"))).alias("c2"),
    ).collect()
    assert row["c1"] == row["c2"]
    banned = set("\u200b\u200c\u200d\ufeff\u2018\u2019\u201c\u201d"
                 "\u2013\u2014\u2026\u00a0\u0000\u0007")
    assert not (set(row["c1"]) & banned)
    assert "  " not in row["c1"]


def test_token_count_arrow_matches_expression(spark):
    """mapInArrow token counting must equal the codegen'd expression on
    real corpus docs plus whitespace edge cases."""
    from pr2_transformation_spark.functions.textstats import (
        token_count,
        token_count_arrow,
    )
    import pyspark.sql.functions as F

    rows = [
        (1, "plain three tokens"),
        (2, "  leading  and   trailing  "),
        (3, "single"),
        (4, "tabs\tand\nnewlines here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    via_expr = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", token_count(F.col("text")).alias("n")
        ).collect()
    }
    via_arrow = {
        r["doc_id"]: r["n_tokens"]
        for r in token_count_arrow(df).collect()
    }
    assert via_arrow == via_expr
