"""Property-based invariants for the VP8 entropy-coding layer.

The conformance suite (test_vp8_conformance.py) proves the WHOLE
decoder against libwebp; these properties pin the coder primitives in
isolation so a regression localizes: any (bit, probability) sequence
must survive a BoolWriter -> BoolReader round trip, including the
carry-propagation and 0xFF-run paths that only show up on adversarial
sequences, and every tree must encode/decode every leaf under every
probability table shape.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pr2_transformation_spark.functions.vp8 import (
    BMODE_TREE,
    KF_YMODE_TREE,
    SEGMENT_TREE,
    TOKEN_TREE,
    UV_MODE_TREE,
    BoolReader,
    BoolWriter,
)

_seq = st.lists(
    st.tuples(st.integers(0, 1), st.integers(1, 254)),
    min_size=0,
    max_size=400,
)


@settings(max_examples=200, deadline=None)
@given(_seq)
def test_bool_coder_round_trip(seq):
    w = BoolWriter()
    for bit, prob in seq:
        w.put(bit, prob)
    buf = w.finish()
    r = BoolReader(buf)
    for bit, prob in seq:
        assert r.get(prob) == bit


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 255), min_size=0, max_size=64))
def test_literal_round_trip(values):
    w = BoolWriter()
    for v in values:
        w.literal(v, 8)
    r = BoolReader(w.finish())
    for v in values:
        assert r.literal(8) == v


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_tree_round_trip_every_tree(data):
    trees = {
        "ymode": (KF_YMODE_TREE, 4),
        "uv": (UV_MODE_TREE, 3),
        "bmode": (BMODE_TREE, 9),
        "segment": (SEGMENT_TREE, 3),
        "token": (TOKEN_TREE, 11),
    }
    name = data.draw(st.sampled_from(sorted(trees)))
    tree, n_probs = trees[name]
    probs = data.draw(
        st.lists(st.integers(1, 254), min_size=n_probs, max_size=n_probs)
    )
    leaves = sorted({-x for x in tree if x <= 0})
    seq = data.draw(st.lists(st.sampled_from(leaves), min_size=1, max_size=40))
    w = BoolWriter()
    for leaf in seq:
        w.tree(tree, probs, leaf)
    r = BoolReader(w.finish())
    for leaf in seq:
        assert r.tree(tree, probs) == leaf


def test_carry_propagation_through_ff_runs():
    """A long run of maximally-skewed zeros drives `low` into 0xFF
    territory; a late 1 forces the carry to ripple through emitted
    bytes.  The decoder must still read every bit back."""
    w = BoolWriter()
    pattern = [(0, 254)] * 120 + [(1, 1)] + [(0, 254)] * 60 + [(1, 254)]
    for bit, prob in pattern:
        w.put(bit, prob)
    r = BoolReader(w.finish())
    for bit, prob in pattern:
        assert r.get(prob) == bit
