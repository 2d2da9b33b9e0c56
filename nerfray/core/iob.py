"""Extended-IOB ("joined label") codec for nested spans.

Reference: dep ``data-named-0.6.2`` used at
/root/reference/src/NLP/Nerf.hs:43-50,94-99 (SURVEY.md §8.1). A token's CRF
label is the *stack* of its entity ancestors, outermost first, each atom
marked B(egin) or I(nside):

    <org>Church of the <deity>F S M</deity></org>
    Church:[B org] of:[I org] the:[I org]
    F:[I org, B deity] S:[I org, I deity] M:[I org, I deity]

Instead of the reference's rose-tree ``NeForest`` we use the equivalent flat
span table (label, start, end, depth) over token indices — the forest is
recoverable from containment (SURVEY.md §1.2). ``encode`` and ``decode`` are
inverse on well-formed input (property-tested).

Pinned repair rule for ill-formed decoder input (the Hackage source is not
in the sandbox; SURVEY.md §8.1 requires the rule be pinned and tested): an
``I x`` atom at depth d continues the currently-open span at depth d only if
that span's label is x AND every shallower atom of this token is itself a
valid continuation; otherwise the atom is treated as ``B x`` (it closes any
open spans at depth >= d and opens a fresh one).
"""

from __future__ import annotations

from typing import NamedTuple


class Span(NamedTuple):
    label: str
    start: int  # token index, inclusive
    end: int    # token index, exclusive
    depth: int  # 0 = outermost


# An atom is (is_begin, label); a stack is a tuple of atoms, outermost first.
Atom = tuple[bool, str]
Stack = tuple[Atom, ...]

O_STACK: Stack = ()


def stack_to_str(stack: Stack) -> str:
    """Stable string form used as the CRF label-vocabulary key."""
    if not stack:
        return "O"
    return "|".join(("B:" if b else "I:") + lbl for b, lbl in stack)


def stack_from_str(s: str) -> Stack:
    if s == "O":
        return ()
    out = []
    for part in s.split("|"):
        kind, lbl = part.split(":", 1)
        out.append((kind == "B", lbl))
    return tuple(out)


def encode(spans: list[Span], n_tokens: int) -> list[Stack]:
    """Nested span set -> per-token atom stacks.

    ``spans`` must be properly nested (each pair disjoint or contained);
    depth fields are recomputed from containment, so callers may pass 0.
    """
    per_token: list[list[tuple[Span, bool]]] = [[] for _ in range(n_tokens)]
    # outermost first: sort by (start asc, end desc); ties broken by depth
    for sp in sorted(spans, key=lambda s: (s.start, -s.end, s.depth)):
        if not (0 <= sp.start < sp.end <= n_tokens):
            raise ValueError(f"span out of range: {sp} (n_tokens={n_tokens})")
        for t in range(sp.start, sp.end):
            per_token[t].append((sp, t == sp.start))
    return [tuple((is_b, sp.label) for sp, is_b in stacks)
            for stacks in per_token]


def decode(stacks: list[Stack]) -> list[Span]:
    """Per-token atom stacks -> span set (with the pinned repair rule)."""
    spans: list[Span] = []
    open_spans: list[tuple[str, int]] = []  # (label, start_tok), outermost first

    def close_from(depth: int, end_tok: int) -> None:
        while len(open_spans) > depth:
            lbl, start = open_spans.pop()
            spans.append(Span(lbl, start, end_tok, len(open_spans)))

    for t, stack in enumerate(stacks):
        continued = True  # all shallower atoms of this token continued cleanly
        for d, (is_b, lbl) in enumerate(stack):
            if (not is_b and continued and d < len(open_spans)
                    and open_spans[d][0] == lbl):
                continue  # valid continuation of open span at depth d
            # begin (or repaired ill-formed I): close deeper opens, open anew
            close_from(d, t)
            open_spans.append((lbl, t))
            continued = False
        close_from(len(stack), t)
    close_from(0, len(stacks))
    spans.sort(key=lambda s: (s.start, -s.end, s.depth))
    return spans
