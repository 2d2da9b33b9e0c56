"""XCES-style XML corpus: chunk, parse, annotate, render.

Reference: /root/reference/src/NLP/Nerf/XCES.hs (SURVEY.md §2.1 S4/S5,
§2.2 M18). Semantics reproduced:

- lex the document into a flat tag/text stream; drop processing noise
  (whitespace-only text between tags) but PRESERVE foreign markup inside
  tokens (XCES.hs:76-97)
- chunk into ``<chunk type="s">`` sentences (XCES.hs:107-130); content
  outside sentence chunks passes through untouched
- a token is ``<tok>`` with ``<orth>TEXT</orth>`` plus arbitrary foreign
  sub-XML (preserved verbatim); ``<ns/>`` before a token means
  "no preceding space" (XCES.hs:222-249)
- ``restore_sentence`` rebuilds the raw sentence string honoring ns flags
  and strips the leading space (XCES.hs:350-356)
- annotation wraps token ranges in ``<group type="LABEL">`` elements,
  nested per span depth (XCES.hs:186-213)

Fidelity target is fixture scale (SURVEY.md §7.5): a well-formed subset
of XML (no CDATA/comments/doctype), which covers the reference's own
rendering output.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .iob import Span

_TOK_RE = re.compile(r"<tok>(.*?)</tok>|<ns/>", re.S)
_ORTH_RE = re.compile(r"<orth>(.*?)</orth>", re.S)
_SENT_RE = re.compile(r'(<chunk type="s">)(.*?)(</chunk>)', re.S)


@dataclass
class Tok:
    """XCES token: surface + no-preceding-space flag + foreign sub-XML
    (everything inside <tok> other than <orth>), preserved verbatim."""
    orth: str
    nps: bool = False
    foreign: str = ""


@dataclass
class Sent:
    toks: list[Tok] = field(default_factory=list)
    spans: list[Span] = field(default_factory=list)  # token-grain, nested


def parse_sent(xml: str) -> Sent:
    """Parse the inside of one <chunk type="s"> into tokens."""
    toks: list[Tok] = []
    pending_ns = False
    for m in _TOK_RE.finditer(xml):
        if m.group(0) == "<ns/>":
            pending_ns = True
            continue
        body = m.group(1)
        om = _ORTH_RE.search(body)
        orth = unescape_xml(om.group(1)) if om else ""
        foreign = (body[:om.start()] + body[om.end():]).strip() if om else body.strip()
        toks.append(Tok(orth=orth, nps=pending_ns, foreign=foreign))
        pending_ns = False
    return Sent(toks=toks)


def restore_sentence(sent: Sent) -> str:
    """Raw sentence text honoring nps flags (XCES.hs:350-356)."""
    out = []
    for t in sent.toks:
        if not t.nps:
            out.append(" ")
        out.append(t.orth)
    return "".join(out).lstrip(" ")


def escape_xml(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def unescape_xml(s: str) -> str:
    return (s.replace("&quot;", '"').replace("&gt;", ">")
            .replace("&lt;", "<").replace("&amp;", "&"))


def render_tok(t: Tok) -> str:
    ns = "<ns/>" if t.nps else ""
    foreign = t.foreign if t.foreign else ""
    return f"{ns}<tok><orth>{escape_xml(t.orth)}</orth>{foreign}</tok>"


def render_sent(sent: Sent) -> str:
    """Render tokens, wrapping annotated spans in nested <group> elements
    (outermost opens first — XCES.hs:186-213)."""
    n = len(sent.toks)
    opens: list[list[str]] = [[] for _ in range(n)]
    closes: list[list[str]] = [[] for _ in range(n)]
    for sp in sorted(sent.spans, key=lambda s: (s.start, -s.end, s.depth)):
        opens[sp.start].append(f'<group type="{escape_xml(sp.label)}">')
        closes[sp.end - 1].insert(0, "</group>")
    parts = []
    for k, t in enumerate(sent.toks):
        parts.append("".join(opens[k]))
        parts.append(render_tok(t))
        parts.append("".join(closes[k]))
    return "".join(parts)


def ner_xces(doc: str, span_fn) -> str:
    """Annotate every sentence chunk of an XCES document in place
    (the reference's ``nerXCES``, XCES.hs:320-338, parameterized by ANY
    sentence-tagging function — SURVEY.md §2.10).

    ``span_fn(text) -> list[Span]`` returns char-offset spans over the
    restored sentence; they are mapped onto XCES tokens by char-interval
    intersection (Tok.sync analog, XCES.hs:343-347).
    """
    def annotate(m: re.Match) -> str:
        sent = parse_sent(m.group(2))
        text = restore_sentence(sent)
        char_spans = span_fn(text)
        # token char intervals in the restored text
        bounds = []
        pos = 0
        for i, t in enumerate(sent.toks):
            if i > 0 and not t.nps:
                pos += 1
            bounds.append((pos, pos + len(t.orth)))
            pos += len(t.orth)
        tok_spans = []
        for sp in char_spans:
            lo = hi = None
            for i, (a, b) in enumerate(bounds):
                if a < sp.end and b > sp.start:
                    if lo is None:
                        lo = i
                    hi = i + 1
            if lo is not None:
                tok_spans.append(Span(sp.label, lo, hi, sp.depth))
        sent.spans = tok_spans
        return m.group(1) + render_sent(sent) + m.group(3)

    return _SENT_RE.sub(annotate, doc)


def sent_to_xces(text: str, tokenizer) -> str:
    """Build a sentence chunk from raw text (writer-side helper)."""
    toks = tokenizer(text)
    out = []
    prev_end = None
    for t in toks:
        nps = prev_end is not None and t.start == prev_end
        out.append(render_tok(Tok(orth=t.text, nps=nps)))
        prev_end = t.end
    return '<chunk type="s">' + "".join(out) + "</chunk>"
