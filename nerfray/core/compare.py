"""Span-set evaluation: per-label TP/FP/FN and P/R/F.

Reference: /root/reference/src/NLP/Nerf/Compare.hs (SURVEY.md §2.5 A1, §5.1).
A predicted node matches a gold node iff their (label, whitespace-free
character span) pairs are equal (Compare.hs:37-40, 91-98) — tokenization
differences that only move whitespace do not affect the score. Per label:
TP = |gold ∩ pred|, FN = |gold \\ pred|, FP = |pred \\ gold|; stats merge by
pointwise addition across units (Compare.hs:44-54) — in the Ray pipeline
this merge is a ``groupby("label").sum()`` (SURVEY.md §2.5).
"""

from __future__ import annotations

from collections import defaultdict


def wsfree_span(text: str, start: int, end: int) -> tuple[int, int]:
    """Map a raw [start, end) char span of ``text`` to whitespace-free
    coordinates (count of non-whitespace chars strictly before an index)."""
    a = sum(1 for c in text[:start] if not c.isspace())
    b = a + sum(1 for c in text[start:end] if not c.isspace())
    return a, b


def unit_stats(text: str,
               gold: list[tuple[str, int, int]],
               pred: list[tuple[str, int, int]]) -> dict[str, tuple[int, int, int]]:
    """Per-label (tp, fp, fn) for one unit; spans are (label, start, end)
    raw char offsets into ``text``."""
    gset = {(lbl, *wsfree_span(text, a, b)) for lbl, a, b in gold}
    pset = {(lbl, *wsfree_span(text, a, b)) for lbl, a, b in pred}
    out: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0])
    for node in gset & pset:
        out[node[0]][0] += 1
    for node in pset - gset:
        out[node[0]][1] += 1
    for node in gset - pset:
        out[node[0]][2] += 1
    return {lbl: tuple(v) for lbl, v in out.items()}


def merge(stats: list[dict[str, tuple[int, int, int]]]) -> dict[str, tuple[int, int, int]]:
    """Pointwise-add per-label stats across units (Compare.hs:44-54)."""
    acc: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0])
    for st in stats:
        for lbl, (tp, fp, fn) in st.items():
            acc[lbl][0] += tp
            acc[lbl][1] += fp
            acc[lbl][2] += fn
    return {lbl: tuple(v) for lbl, v in acc.items()}


def prf(tp: int, fp: int, fn: int) -> tuple[float, float, float]:
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f = 2 * p * r / (p + r) if p + r else 0.0
    return p, r, f


def set_prf(gold: set, pred: set) -> tuple[float, float, float]:
    """P/R/F of two plain sets (used for the triple-level gate)."""
    tp = len(gold & pred)
    return prf(tp, len(pred - gold), len(gold - pred))
