"""ENAMEX inline-tag corpus format: parse and render.

Reference format (/root/reference/README.md:34-48, example/train.nes;
SURVEY.md §2.1 S1/S2, M19): one sentence per line; nested entities as
embedded ``<type>...</type>`` tags directly adjacent to their content;
``>``, ``<``, ``\\`` and space escaped by a preceding ``\\`` in both text
and label values. Tokens are space-separated.

We parse to (words, spans) where spans are token-grain ``iob.Span`` rows —
the flat equivalent of the reference's ``NeForest`` (SURVEY.md §1.2).
``render`` is the inverse (parse ∘ render ≡ id on well-formed input —
"isomorphic functions", nerf.cabal_backup description; property-tested).
"""

from __future__ import annotations

from .iob import Span

_SPECIAL = {"<", ">", "\\", " "}


def escape(s: str) -> str:
    return "".join("\\" + c if c in _SPECIAL else c for c in s)


def parse(line: str) -> tuple[list[str], list[Span]]:
    """Parse one ENAMEX sentence into (words, nested token-grain spans)."""
    words: list[str] = []
    spans: list[Span] = []
    stack: list[tuple[str, int]] = []  # (label, start word index)
    cur: list[str] = []

    def flush() -> None:
        if cur:
            words.append("".join(cur))
            cur.clear()

    i, n = 0, len(line)
    while i < n:
        c = line[i]
        if c == "\\" and i + 1 < n:
            cur.append(line[i + 1])
            i += 2
        elif c == " ":
            flush()
            i += 1
        elif c == "<":
            flush()
            j = i + 1
            tag_chars: list[str] = []
            while j < n:
                cj = line[j]
                if cj == "\\" and j + 1 < n:
                    tag_chars.append(line[j + 1])
                    j += 2
                elif cj == ">":
                    break
                else:
                    tag_chars.append(cj)
                    j += 1
            if j >= n:
                raise ValueError(f"unterminated tag in: {line!r}")
            tag = "".join(tag_chars)
            if tag.startswith("/"):
                label = tag[1:]
                if not stack or stack[-1][0] != label:
                    raise ValueError(f"mismatched </{label}> in: {line!r}")
                _, start = stack.pop()
                spans.append(Span(label, start, len(words), len(stack)))
            else:
                stack.append((tag, len(words)))
            i = j + 1
        else:
            cur.append(c)
            i += 1
    flush()
    if stack:
        raise ValueError(f"unclosed tags {stack!r} in: {line!r}")
    spans.sort(key=lambda s: (s.start, -s.end, s.depth))
    return words, spans


def render(words: list[str], spans: list[Span]) -> str:
    """Render (words, nested spans) back to an ENAMEX line."""
    opens: list[list[str]] = [[] for _ in range(len(words))]
    closes: list[list[str]] = [[] for _ in range(len(words))]
    # outermost spans open first and close last at a given boundary
    for sp in sorted(spans, key=lambda s: (s.start, -s.end, s.depth)):
        opens[sp.start].append(f"<{escape(sp.label)}>")
        closes[sp.end - 1].insert(0, f"</{escape(sp.label)}>")
    units = ["".join(opens[k]) + escape(w) + "".join(closes[k])
             for k, w in enumerate(words)]
    return " ".join(units)
