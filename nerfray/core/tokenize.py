"""Tokenizer with character offsets.

Reference semantics: ``tokenize = whitespace >=> uris >=> punctuation``
(/root/reference/src/NLP/Nerf/Tokenize.hs:41-50, pinned dep tokenize-0.3.0,
SURVEY.md §2.2 M1, §8.5):

1. split on whitespace,
2. keep URI-looking tokens whole,
3. split leading/trailing punctuation characters off as single-char tokens
   (internal punctuation — e.g. the dots of ``json.load`` — stays inside).

Unlike the reference we natively carry (start, end) character offsets for
every token, which makes the reference's interval-based re-sync machinery
(Tokenize.hs:101-186) mostly unnecessary downstream; ``essence_intervals``
reproduces its whitespace-free coordinate system for span comparison
(Tokenize.hs:75-77, Compare.hs:91-98).
"""

from __future__ import annotations

import re
import unicodedata
from typing import NamedTuple


class Token(NamedTuple):
    text: str
    start: int  # char offset into the source string, inclusive
    end: int    # exclusive


_FIELD_RE = re.compile(r"\S+")
# Pinned URI heuristic: scheme '://' or leading www. — kept whole.
_URI_RE = re.compile(r"^(?:[A-Za-z][A-Za-z0-9+.-]*://|www\.)\S+$")


def _is_punct(ch: str) -> bool:
    """Pinned punctuation class: Unicode general category P*."""
    return unicodedata.category(ch).startswith("P")


def tokenize(text: str) -> list[Token]:
    """Tokenize ``text`` into offset-carrying tokens.

    Deterministic and order-preserving; offsets index the original string.
    """
    out: list[Token] = []
    for m in _FIELD_RE.finditer(text):
        field = m.group(0)
        base = m.start()
        if _URI_RE.match(field):
            out.append(Token(field, base, base + len(field)))
            continue
        lo, hi = 0, len(field)
        lead: list[Token] = []
        while lo < hi and _is_punct(field[lo]):
            lead.append(Token(field[lo], base + lo, base + lo + 1))
            lo += 1
        trail: list[Token] = []
        while hi > lo and _is_punct(field[hi - 1]):
            trail.append(Token(field[hi - 1], base + hi - 1, base + hi))
            hi -= 1
        out.extend(lead)
        if hi > lo:
            out.append(Token(field[lo:hi], base + lo, base + hi))
        out.extend(reversed(trail))
    return out


def words(text: str) -> list[str]:
    """Token surface forms only (reference's ``[Word]``)."""
    return [t.text for t in tokenize(text)]


def essence_intervals(tokens: list[Token]) -> list[tuple[int, int]]:
    """Whitespace-free coordinate intervals, one per token.

    Token k covers [a, b) in a coordinate system that counts only
    non-whitespace characters of the source — the reference's ``essence`` /
    ``ranged`` construction (Tokenize.hs:75-93). Because our tokens never
    contain whitespace, the interval length is just ``len(text)``.
    """
    out = []
    pos = 0
    for t in tokens:
        out.append((pos, pos + len(t.text)))
        pos += len(t.text)
    return out
