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

import pytest
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


def test_webp_animation_roundtrip_and_compositing():
    """Mux/demux round trip plus the spec compositing rules: replace vs
    alpha-blend, dispose-to-background, offsets, durations."""
    import numpy as np

    from pr2_transformation_spark.functions import multimodal, vp8

    base = np.zeros((16, 16, 4), np.uint8)
    base[..., 0] = 100
    base[..., 3] = 255
    half = np.zeros((8, 8, 4), np.uint8)
    half[..., 1] = 200
    half[..., 3] = 128  # semi-transparent for the blend case
    f1 = multimodal.webp_encode(base)
    f2 = multimodal.webp_encode(half)
    anim = vp8.webp_anim_encode(
        [
            {"payload": f1, "x": 0, "y": 0, "duration_ms": 40,
             "blend": False, "dispose": False},
            {"payload": f2, "x": 8, "y": 0, "duration_ms": 70,
             "blend": True, "dispose": True},
        ],
        canvas_w=16, canvas_h=16, background=(0, 0, 0, 0), loop_count=3,
    )
    info = vp8.webp_anim_frames(anim)
    assert info["canvas"] == {"has_anim": True, "width": 16, "height": 16}
    assert info["anim"]["loop_count"] == 3
    assert [f["duration_ms"] for f in info["frames"]] == [40, 70]
    assert [f["blend"] for f in info["frames"]] == [False, True]
    assert [f["dispose"] for f in info["frames"]] == [False, True]
    # each demuxed frame payload decodes standalone
    for f in info["frames"]:
        px = multimodal.webp_pixels(f["payload"])
        assert px.shape == (f["height"], f["width"], 4)

    frames = vp8.webp_anim_composite(anim)
    assert len(frames) == 2
    # frame 1: full replace
    assert (frames[0][..., 0] == 100).all() and (frames[0][..., 3] == 255).all()
    # frame 2: src-over blend of the half-alpha green patch on the red base
    blended = frames[1][0, 8]
    a = 128
    exp_r = (100 * 255 * (255 - a) // 255) // 255
    exp_g = (200 * a) // 255
    assert abs(int(blended[0]) - exp_r) <= 1
    assert abs(int(blended[1]) - exp_g) <= 1
    assert (frames[1][:, :8] == frames[0][:, :8]).all()  # untouched half

    with pytest.raises(ValueError, match="even"):
        vp8.webp_anim_encode([{"payload": f1, "x": 1}], 16, 16)
    with pytest.raises(ValueError, match="animated"):
        vp8.webp_anim_frames(f1)
