"""Re-sync spans from one tokenization onto another.

Reference: ``NLP.Nerf.Tokenize.sync`` (/root/reference/src/NLP/Nerf/
Tokenize.hs:101-186; SURVEY.md §2.2 M4, §2.4 J2): compute whitespace-free
character intervals for the tokens of both tokenizations (``essence``/
``ranged``, Tokenize.hs:75-93), then re-express each span in the new token
grid as the run of new tokens whose intervals intersect the span's interval.
Used when gold annotations (e.g. ENAMEX training data) were produced over a
different token grid than the engine's own tokenizer (Nerf.hs:52-58).

Because our spans are flat (label, start, end, depth) rows rather than a
rose tree, the reference's interval-map surgery reduces to an interval
intersection sweep per span; nesting is preserved because interval
containment is preserved by the mapping.
"""

from __future__ import annotations

from .iob import Span


def _intervals(tokens: list[str]) -> list[tuple[int, int]]:
    out, pos = [], 0
    for t in tokens:
        out.append((pos, pos + len(t)))
        pos += len(t)
    return out


def sync(spans: list[Span], old_tokens: list[str],
         new_tokens: list[str]) -> list[Span]:
    """Map token-grain ``spans`` over ``old_tokens`` onto ``new_tokens``.

    Both token lists must spell the same whitespace-free character sequence
    (the reference asserts the same by construction, Tokenize.hs:164-186).
    Spans that cover no new token (possible only on empty input) are dropped.
    """
    old_iv = _intervals(old_tokens)
    new_iv = _intervals(new_tokens)
    out: list[Span] = []
    for sp in spans:
        a = old_iv[sp.start][0]
        b = old_iv[sp.end - 1][1]
        lo = None
        hi = None
        for j, (x, y) in enumerate(new_iv):
            if x < b and y > a:  # intersects
                if lo is None:
                    lo = j
                hi = j + 1
        if lo is not None:
            out.append(Span(sp.label, lo, hi, sp.depth))
    out.sort(key=lambda s: (s.start, -s.end, s.depth))
    return out
