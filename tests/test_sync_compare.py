"""Re-sync (Tokenize.hs:101-186) and compare stats (Compare.hs; FIXTURES F6)."""

from nerfray.core import compare, sync
from nerfray.core.iob import Span


def test_sync_identity():
    toks = ["a", "bb", "c"]
    spans = [Span("x", 0, 2, 0)]
    assert sync.sync(spans, toks, toks) == spans


def test_sync_split_tokens():
    # old: ["ab", "cd"]; new: ["a", "b", "cd"] — same essence "abcd"
    spans = [Span("x", 0, 1, 0)]
    assert sync.sync(spans, ["ab", "cd"], ["a", "b", "cd"]) == \
        [Span("x", 0, 2, 0)]


def test_sync_merge_tokens():
    spans = [Span("x", 0, 2, 0), Span("y", 2, 3, 0)]
    assert sync.sync(spans, ["a", "b", "cd"], ["ab", "cd"]) == \
        [Span("x", 0, 1, 0), Span("y", 1, 2, 0)]


def test_sync_partial_overlap_expands():
    # span covers "b" only; new tokenization glues "ab" — span expands to it
    spans = [Span("x", 1, 2, 0)]
    assert sync.sync(spans, ["a", "b"], ["ab"]) == [Span("x", 0, 1, 0)]


def test_sync_preserves_nesting():
    spans = [Span("out", 0, 3, 0), Span("in", 1, 2, 1)]
    got = sync.sync(spans, ["a", "b", "c"], ["a", "b", "c"])
    assert got == spans


def test_wsfree_span():
    assert compare.wsfree_span("a b c", 2, 3) == (1, 2)
    assert compare.wsfree_span("  xy", 2, 4) == (0, 2)


def test_unit_stats_whitespace_invariant():
    """Same entity, different whitespace -> equal ws-free spans (tp)."""
    g = compare.unit_stats("a  bc", [("x", 3, 5)], [("x", 3, 5)])
    assert g == {"x": (1, 0, 0)}
    # ws-free identity across different raw offsets
    a = compare.wsfree_span("a  bc", 3, 5)
    b = compare.wsfree_span("a bc", 2, 4)
    assert a == b


def test_unit_stats_fp_fn_and_label_mismatch():
    st = compare.unit_stats("ab cd ef",
                            gold=[("x", 0, 2), ("y", 3, 5)],
                            pred=[("x", 0, 2), ("z", 3, 5), ("x", 6, 8)])
    assert st["x"] == (1, 1, 0)
    assert st["y"] == (0, 0, 1)
    assert st["z"] == (0, 1, 0)


def test_merge_and_prf():
    merged = compare.merge([{"x": (1, 0, 0)}, {"x": (1, 2, 1), "y": (0, 1, 0)}])
    assert merged == {"x": (2, 2, 1), "y": (0, 1, 0)}
    p, r, f = compare.prf(2, 2, 1)
    assert (p, r) == (0.5, 2 / 3)
    assert compare.prf(0, 0, 0) == (0.0, 0.0, 0.0)


def test_set_prf():
    p, r, f = compare.set_prf({1, 2, 3, 4}, {2, 3, 4, 5})
    assert (p, r) == (0.75, 0.75)
