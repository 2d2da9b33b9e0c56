"""Ox-style text helpers (pinned from monad-ox-0.2.0 call sites).

SURVEY.md §2.8 / §8.4: the reference's feature blocks use ``prefix``/
``suffix`` with BOTH positive and non-positive arguments
(/root/reference/src/NLP/Nerf/Schema.hs:123-153):

- ``prefix k`` for k > 0  → first k characters (None if k > len);
- ``prefix k`` for k <= 0 → trim |k| characters off the END (None if nothing
  would remain);  used by ``lemmaB`` with trims ``[0, -1 .. -n]``
  (Schema.hs:152-153);
- ``suffix`` mirrors (last k chars / trim |k| off the start).
- ``shape``  → per-character class string over {u, l, d, x}
  (upper/lower/digit/other);
- ``pack``   → collapse runs of equal characters ("Xxx-dd" → "Xx-d").

The exact Hackage sources are not in the sandbox; these edge semantics are
pinned HERE (None ⇔ Ox's ``save Nothing`` records no observation) and
fixture-tested in tests/test_ox.py.
"""

from __future__ import annotations


def prefix(k: int, s: str) -> str | None:
    if k > 0:
        return s[:k] if k <= len(s) else None
    keep = len(s) + k  # k <= 0: trim |k| chars from the end
    return s[:keep] if keep > 0 else None


def suffix(k: int, s: str) -> str | None:
    if k > 0:
        return s[-k:] if k <= len(s) else None
    keep = len(s) + k  # k <= 0: trim |k| chars from the start
    return s[len(s) - keep:] if keep > 0 else None


def shape(s: str) -> str:
    out = []
    for ch in s:
        if ch.isupper():
            out.append("u")
        elif ch.islower():
            out.append("l")
        elif ch.isdigit():
            out.append("d")
        else:
            out.append("x")
    return "".join(out)


def pack(s: str) -> str:
    out = []
    prev = None
    for ch in s:
        if ch != prev:
            out.append(ch)
            prev = ch
    return "".join(out)
