"""ENAMEX parse/render round-trip (README.md:36-50; nerf.cabal description)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nerfray.core import enamex
from nerfray.core.iob import Span


def test_reference_example():
    line = ("<organization>Church of the <deity>Flying Spaghetti Monster"
            "</deity></organization> .")
    words, spans = enamex.parse(line)
    assert words == ["Church", "of", "the", "Flying", "Spaghetti",
                     "Monster", "."]
    assert spans == [Span("organization", 0, 6, 0), Span("deity", 3, 6, 1)]
    assert enamex.render(words, spans) == line


def test_hierarchical_labels():
    line = "<placeName.country>Chorwacji</placeName.country> wins"
    words, spans = enamex.parse(line)
    assert words == ["Chorwacji", "wins"]
    assert spans == [Span("placeName.country", 0, 1, 0)]
    assert enamex.render(words, spans) == line


def test_escaping():
    line = r"a\ b <t\>x>c\\d</t\>x>"
    words, spans = enamex.parse(line)
    assert words == ["a b", "c\\d"]
    assert spans == [Span("t>x", 1, 2, 0)]
    assert enamex.render(words, spans) == line


def test_plain_sentence():
    words, spans = enamex.parse("just plain words")
    assert words == ["just", "plain", "words"] and spans == []


def test_errors():
    with pytest.raises(ValueError):
        enamex.parse("<a>unclosed")
    with pytest.raises(ValueError):
        enamex.parse("<a>x</b>")
    with pytest.raises(ValueError):
        enamex.parse("<a>x</a")


@st.composite
def sentences(draw):
    n = draw(st.integers(min_value=1, max_value=6))
    alphabet = st.text(alphabet="ab< >\\", min_size=1, max_size=4)
    words = [draw(alphabet) for _ in range(n)]  # may contain space/</\\ — escaped
    spans = []
    pos = 0
    while pos < n:
        if draw(st.booleans()):
            end = draw(st.integers(min_value=pos + 1, max_value=n))
            spans.append(Span(draw(st.sampled_from(["x", "y z"])), pos, end, 0))
            if end - pos > 1 and draw(st.booleans()):
                spans.append(Span("inner", pos, end - 1, 1))
            pos = end
        else:
            pos += 1
    return words, sorted(spans, key=lambda s: (s.start, -s.end, s.depth))


@settings(max_examples=200, deadline=None)
@given(sentences())
def test_roundtrip_property(case):
    words, spans = case
    line = enamex.render(words, spans)
    w2, s2 = enamex.parse(line)
    assert (w2, s2) == (words, spans)
