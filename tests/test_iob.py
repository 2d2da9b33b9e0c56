"""Extended-IOB codec: round-trip + pinned ill-formed repair (SURVEY §8.1)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from nerfray.core import iob
from nerfray.core.iob import Span


def test_readme_example():
    # <org>Church of the <deity>F S M</deity></org> (README.md:6-14)
    spans = [Span("org", 0, 6, 0), Span("deity", 3, 6, 1)]
    stacks = iob.encode(spans, 6)
    assert [iob.stack_to_str(s) for s in stacks] == [
        "B:org", "I:org", "I:org", "I:org|B:deity", "I:org|I:deity",
        "I:org|I:deity"]
    assert iob.decode(stacks) == spans


def test_adjacent_same_label():
    # two adjacent spans of the same label stay separate via B
    spans = [Span("x", 0, 2, 0), Span("x", 2, 4, 0)]
    stacks = iob.encode(spans, 4)
    assert [iob.stack_to_str(s) for s in stacks] == ["B:x", "I:x", "B:x", "I:x"]
    assert iob.decode(stacks) == spans


def test_o_tokens():
    spans = [Span("a", 1, 2, 0)]
    stacks = iob.encode(spans, 3)
    assert [iob.stack_to_str(s) for s in stacks] == ["O", "B:a", "O"]
    assert iob.decode(stacks) == spans


def test_stack_str_roundtrip():
    for s in ["O", "B:a", "I:a|B:b.c", "B:x|I:y|B:z"]:
        assert iob.stack_to_str(iob.stack_from_str(s)) == s


def test_repair_orphan_inside():
    # I:x with no open x — pinned repair: treated as B:x
    stacks = [iob.stack_from_str(s) for s in ["O", "I:x", "I:x"]]
    assert iob.decode(stacks) == [Span("x", 1, 3, 0)]


def test_repair_label_switch():
    # I:y after open x — closes x, opens y
    stacks = [iob.stack_from_str(s) for s in ["B:x", "I:y"]]
    assert iob.decode(stacks) == [Span("x", 0, 1, 0), Span("y", 1, 2, 0)]


def test_repair_inner_under_fresh_begin():
    # deeper I under a token whose shallower atom began a new span -> B
    stacks = [iob.stack_from_str(s) for s in ["B:a|B:b", "B:a|I:b"]]
    # second token's B:a opens a NEW outer span; its I:b cannot continue the
    # old inner (different outer) -> repaired to a new inner span
    assert iob.decode(stacks) == [
        Span("a", 0, 1, 0), Span("b", 0, 1, 1),
        Span("a", 1, 2, 0), Span("b", 1, 2, 1)]


@st.composite
def nested_spans(draw):
    """Random well-formed nested span sets over n tokens."""
    n = draw(st.integers(min_value=1, max_value=8))
    spans = []
    labels = ["a", "b", "c"]

    def gen(lo, hi, depth):
        if depth >= 3 or hi <= lo:
            return
        pos = lo
        while pos < hi:
            if draw(st.booleans()):
                end = draw(st.integers(min_value=pos + 1, max_value=hi))
                spans.append(Span(draw(st.sampled_from(labels)), pos, end, depth))
                gen(pos, end, depth + 1)
                pos = end
            else:
                pos += 1
    gen(0, n, 0)
    return n, spans


@settings(max_examples=200, deadline=None)
@given(nested_spans())
def test_roundtrip_property(case):
    n, spans = case
    spans = sorted(spans, key=lambda s: (s.start, -s.end, s.depth))
    assert iob.decode(iob.encode(spans, n)) == spans


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from(
    ["O", "B:a", "I:a", "B:b", "I:b", "B:a|B:b", "I:a|I:b", "I:a|B:b",
     "B:a|I:b"]), max_size=10))
def test_decode_total_and_idempotent(strs):
    """decode never crashes on arbitrary stacks, and re-encoding its output
    decodes to the same spans (repair is a fixpoint)."""
    stacks = [iob.stack_from_str(s) for s in strs]
    spans = iob.decode(stacks)
    assert iob.decode(iob.encode(spans, len(stacks))) == spans
