"""XCES-style XML corpus: lex, chunk, parse, annotate, render.

Reference: /root/reference/src/NLP/Nerf/XCES.hs (SURVEY.md §2.1 S4/S5,
§2.2 M18). Semantics reproduced:

- a tag-soup lexer splits the document into open/close/text/comment
  pieces with the RAW bytes of every tag preserved (attributes and all),
  then a tolerant tree parser builds sub-trees — the XmlTree machinery
  of XCES.hs:258-283
- sentence chunking scans the FLAT tag stream for ``<chunk type="s">``
  up to the first ``</chunk>`` (XCES.hs:76-97); everything outside
  sentence chunks passes through byte-verbatim
- within a sentence (XCES.hs:153-173 ``joinSent``): a ``<tok>`` element
  becomes a token carrying its WHOLE sub-tree verbatim (foreign ``<lex>``
  morphology etc. — ``tagsIn``, XCES.hs:222-227) plus every non-token
  sibling element/comment seen since the previous token (``tagsBf``);
  ``<ns/>`` sets the token's no-preceding-space flag AND rides in
  ``tagsBf`` so it re-renders in place; content after the last token is
  kept as ``Sent.add`` (the reference drops it — XCES.hs:201-203 TODO —
  we preserve it, a documented divergence in the reference's intended
  direction)
- ``restore_sentence`` rebuilds the raw sentence string honoring ns
  flags and strips the leading space (XCES.hs:350-356)
- annotation wraps token ranges in ``<group type="LABEL">`` elements,
  nested per span depth (XCES.hs:186-213)

Divergence from the reference renderer: no interspersed newline tags
(the reference pretty-prints with ``\\n`` between elements); rendering
here is compact and whitespace-only text inside sentences is dropped on
parse, mirroring the reference's ``relevant`` filter (XCES.hs:335-338).
Foreign markup round-trips byte-exactly either way.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .iob import Span

# kept for compatibility (tests and fixture helpers extract sentence
# bodies with it); the annotator itself uses the tag-soup path below
_SENT_RE = re.compile(r'(<chunk type="s">)(.*?)(</chunk>)', re.S)

_ORTH_RE = re.compile(r"<orth>(.*?)</orth>", re.S)

# ---------------------------------------------------------------------------
# tag-soup lexer (XCES.hs:331 S.parseTags analog)
# ---------------------------------------------------------------------------

# final lone-"<" alternative: an unterminated "<" (no subsequent ">")
# matches neither the tag nor the text branch, so without it the byte
# would be silently dropped — it must pass through as a text piece to
# keep the byte-verbatim guarantee on malformed input
_LEX_RE = re.compile(r"<!--.*?-->|<[^>]*>|[^<]+|<", re.S)
_NAME_RE = re.compile(r"</?\s*([A-Za-z_][\w:.-]*)")


@dataclass
class Piece:
    """One lexed piece: kind in {open, close, text, comment};
    ``raw`` is the exact source slice (attribute bytes intact);
    ``name`` set for open/close; ``self_closing`` for ``<ns/>``-style."""
    kind: str
    raw: str
    name: str = ""
    self_closing: bool = False


def lex_tags(xml: str) -> list[Piece]:
    out: list[Piece] = []
    for m in _LEX_RE.finditer(xml):
        raw = m.group(0)
        if raw == "<":
            out.append(Piece("text", raw))
        elif raw.startswith("<!--"):
            out.append(Piece("comment", raw))
        elif raw.startswith("</"):
            nm = _NAME_RE.match(raw)
            out.append(Piece("close", raw, nm.group(1) if nm else ""))
        elif raw.startswith("<"):
            nm = _NAME_RE.match(raw)
            out.append(Piece("open", raw, nm.group(1) if nm else "",
                             raw.rstrip(">").rstrip().endswith("/")))
        else:
            out.append(Piece("text", raw))
    return out


# ---------------------------------------------------------------------------
# tolerant tree parser (XCES.hs:258-283 XmlTree analog)
# ---------------------------------------------------------------------------


@dataclass
class XNode:
    """Parsed sub-tree. ``kind`` elem|text|comment; for elem, ``raw`` is
    the verbatim opening tag and ``children`` the sub-forest."""
    kind: str
    raw: str
    name: str = ""
    children: list["XNode"] = field(default_factory=list)
    self_closing: bool = False


def _parse_forest(pieces: list[Piece], i: int, stop_name: str | None
                  ) -> tuple[list[XNode], int]:
    out: list[XNode] = []
    while i < len(pieces):
        p = pieces[i]
        if p.kind == "close":
            if stop_name is not None:
                # tolerant: any close ends the current element
                return out, i
            i += 1  # stray close at top level: drop
            continue
        if p.kind in ("text", "comment"):
            out.append(XNode(p.kind, p.raw))
            i += 1
            continue
        if p.self_closing:
            out.append(XNode("elem", p.raw, p.name, [], True))
            i += 1
            continue
        children, j = _parse_forest(pieces, i + 1, p.name)
        out.append(XNode("elem", p.raw, p.name, children))
        i = j + 1 if j < len(pieces) else j
    return out, i


def parse_forest(xml: str) -> list[XNode]:
    forest, _ = _parse_forest(lex_tags(xml), 0, None)
    return forest


def render_node(n: XNode) -> str:
    """Verbatim re-render: raw tag bytes + recursively rendered children
    (the enumTree analog, XCES.hs:280-283)."""
    if n.kind != "elem" or n.self_closing:
        return n.raw
    return n.raw + "".join(render_node(c) for c in n.children) \
        + f"</{n.name}>"


def _attr_type_s(raw_open: str) -> bool:
    return re.search(r"""type\s*=\s*["']s["']""", raw_open) is not None


# ---------------------------------------------------------------------------
# XCES sentence model (XCES.hs:143-173, 222-227)
# ---------------------------------------------------------------------------


@dataclass
class Tok:
    """XCES token: surface + no-preceding-space flag + verbatim sub-tree
    (``tree`` = tagsIn) + non-token siblings before it (``before`` =
    tagsBf, including the <ns/> marker itself). ``foreign`` keeps the
    rendered non-orth inner markup for inspection/back-compat."""
    orth: str
    nps: bool = False
    foreign: str = ""
    tree: XNode | None = None
    before: list[XNode] = field(default_factory=list)


@dataclass
class Sent:
    toks: list[Tok] = field(default_factory=list)
    spans: list[Span] = field(default_factory=list)  # token-grain, nested
    add: list[XNode] = field(default_factory=list)   # after last token


def escape_xml(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def unescape_xml(s: str) -> str:
    return (s.replace("&quot;", '"').replace("&gt;", ">")
            .replace("&lt;", "<").replace("&amp;", "&"))


def _orth_of(tok_tree: XNode) -> str:
    """First direct <orth> child's text (tokOrthP, XCES.hs:234-235)."""
    for c in tok_tree.children:
        if c.kind == "elem" and c.name == "orth":
            return unescape_xml(
                "".join(g.raw for g in c.children if g.kind == "text"))
    return ""


def _is_blank_text(n: XNode) -> bool:
    return n.kind == "text" and n.raw.strip() == ""


def _join_sent(forest: list[XNode]) -> Sent:
    """joinSent (XCES.hs:153-173): fold the sentence forest into tokens
    with their before-tags; <ns/> both flags the next token and stays in
    the before-list so it round-trips in place."""
    toks: list[Tok] = []
    acc: list[XNode] = []
    has_ns = False
    for node in forest:
        if _is_blank_text(node):
            continue  # the `relevant` filter, XCES.hs:335-338
        if node.kind == "elem" and node.name == "tok":
            foreign = "".join(
                render_node(c) for c in node.children
                if not (c.kind == "elem" and c.name == "orth")).strip()
            toks.append(Tok(orth=_orth_of(node), nps=has_ns,
                            foreign=foreign, tree=node, before=acc))
            acc = []
            has_ns = False
        elif node.kind == "elem" and node.name == "ns":
            acc.append(node)
            has_ns = True
        else:
            acc.append(node)
    return Sent(toks=toks, add=acc)


def parse_sent(xml: str) -> Sent:
    """Parse the inside of one <chunk type="s"> into tokens (foreign
    markup, attributes and comments preserved verbatim)."""
    return _join_sent(parse_forest(xml))


def restore_sentence(sent: Sent) -> str:
    """Raw sentence text honoring nps flags (XCES.hs:350-356)."""
    out = []
    for t in sent.toks:
        if not t.nps:
            out.append(" ")
        out.append(t.orth)
    return "".join(out).lstrip(" ")


def render_tok(t: Tok) -> str:
    """Verbatim when the token has a parsed tree (before-tags included,
    so <ns/> re-renders in position); template form for writer-built
    tokens (sent_to_xces)."""
    if t.tree is not None:
        return "".join(render_node(b) for b in t.before) \
            + render_node(t.tree)
    ns = "<ns/>" if t.nps else ""
    foreign = t.foreign if t.foreign else ""
    return f"{ns}<tok><orth>{escape_xml(t.orth)}</orth>{foreign}</tok>"


def render_sent(sent: Sent) -> str:
    """Render tokens, wrapping annotated spans in nested <group> elements
    (outermost opens first — XCES.hs:186-213); sentence-trailing
    non-token content (sent.add) is preserved after the last token."""
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
    parts.extend(render_node(x) for x in sent.add)
    return "".join(parts)


# ---------------------------------------------------------------------------
# NER over a whole document (nerXCES, XCES.hs:320-338)
# ---------------------------------------------------------------------------


def _annotate_sent_xml(inner_xml: str, span_fn) -> str:
    sent = parse_sent(inner_xml)
    _attach_spans(sent, span_fn)
    return render_sent(sent)


def _attach_spans(sent: "Sent", span_fn) -> None:
    """Run span_fn over the restored sentence and map the char spans
    onto XCES tokens by interval intersection (Tok.sync analog)."""
    text = restore_sentence(sent)
    char_spans = span_fn(text)
    # token char intervals in the restored text (Tok.sync analog)
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


# ---------------------------------------------------------------------------
# pretty rendering (the reference's newline layout, XCES.hs:194-250,296-309)
# ---------------------------------------------------------------------------


def render_tok_pretty(t: Tok) -> str:
    """renderTok (XCES.hs:237-250): before-tags and the token element
    intercalated with newlines; the token opening tag, the newline-
    joined child sub-trees, and the closing tag each on their own line
    (``between [v, newline] [newline, endFrom v]``)."""
    if t.tree is not None:
        before = "\n".join(render_node(b) for b in t.before)
        kids = "\n".join(render_node(c) for c in t.tree.children)
        if t.tree.self_closing:
            inside = t.tree.raw
        else:
            inside = f"{t.tree.raw}\n{kids}\n</{t.tree.name}>"
        return inside if not before else f"{before}\n{inside}"
    ns = "<ns/>\n" if t.nps else ""
    foreign = f"\n{t.foreign}" if t.foreign else ""
    return (f"{ns}<tok>\n<orth>{escape_xml(t.orth)}</orth>"
            f"{foreign}\n</tok>")


def _render_elems_pretty(sent: Sent, lo: int, hi: int,
                         spans: list[Span]) -> list[str]:
    """Newline-layout NE forest over tokens [lo, hi): group elements
    open/close on their own lines, children newline-joined
    (renderNeTree, XCES.hs:204-211)."""
    out: list[str] = []
    k = lo
    while k < hi:
        cands = [sp for sp in spans if sp.start == k and sp.end <= hi]
        if cands:
            sp = max(cands, key=lambda s: (s.end, -s.depth))
            inner = [s for s in spans
                     if s is not sp and s.start >= sp.start
                     and s.end <= sp.end]
            kids = _render_elems_pretty(sent, sp.start, sp.end, inner)
            out.append(f'<group type="{escape_xml(sp.label)}">\n'
                       + "\n".join(kids) + "\n</group>")
            k = sp.end
        else:
            out.append(render_tok_pretty(sent.toks[k]))
            k += 1
    return out


def render_sent_pretty(sent: Sent) -> str:
    """renderAnnSent body (XCES.hs:194-201): sentence elements
    newline-intercalated, framed by newlines.  Divergence kept from the
    compact renderer: sentence-trailing content (sent.add) is PRESERVED
    (the reference drops it behind a TODO, XCES.hs:199-201)."""
    elems = _render_elems_pretty(sent, 0, len(sent.toks),
                                 list(sent.spans))
    elems.extend(render_node(x) for x in sent.add)
    return "\n" + "\n".join(elems) + "\n"


def ner_xces_pretty(doc: str, span_fn) -> str:
    """``nerXCES`` with the reference's EXACT output layout
    (XCES.hs:296-338): whitespace-only text dropped (the ``relevant``
    filter), sentences annotated, and every top-level item — sentences
    and foreign tags alike — newline-intercalated.  Use ``ner_xces``
    for the byte-verbatim-outside variant."""
    pieces = [p for p in lex_tags(doc)
              if not (p.kind == "text" and p.raw.strip() == "")]
    items: list[str] = []
    i = 0
    while i < len(pieces):
        p = pieces[i]
        if p.kind == "open" and p.name == "chunk" and not p.self_closing \
                and _attr_type_s(p.raw):
            j = i + 1
            while j < len(pieces) and not (pieces[j].kind == "close"
                                           and pieces[j].name == "chunk"):
                j += 1
            inner = "".join(q.raw for q in pieces[i + 1:j])
            sent = parse_sent(inner)
            _attach_spans(sent, span_fn)
            close = pieces[j].raw if j < len(pieces) else "</chunk>"
            items.append(p.raw + render_sent_pretty(sent) + close)
            i = j + 1
        else:
            items.append(p.raw)
            i += 1
    return "\n".join(items)


def ner_xces(doc: str, span_fn) -> str:
    """Annotate every sentence chunk of an XCES document in place
    (the reference's ``nerXCES``, XCES.hs:320-338, parameterized by ANY
    sentence-tagging function — SURVEY.md §2.10).

    ``span_fn(text) -> list[Span]`` returns char-offset spans over the
    restored sentence; they are mapped onto XCES tokens by char-interval
    intersection (Tok.sync analog, XCES.hs:343-347). The flat tag
    stream is scanned like the reference's ``chunk`` (XCES.hs:76-97):
    a sentence runs from ``<chunk type="s">`` to the FIRST ``</chunk>``;
    everything outside sentences passes through byte-verbatim."""
    pieces = lex_tags(doc)
    out: list[str] = []
    i = 0
    while i < len(pieces):
        p = pieces[i]
        if p.kind == "open" and p.name == "chunk" and not p.self_closing \
                and _attr_type_s(p.raw):
            j = i + 1
            while j < len(pieces) and not (pieces[j].kind == "close"
                                           and pieces[j].name == "chunk"):
                j += 1
            inner = "".join(q.raw for q in pieces[i + 1:j])
            out.append(p.raw)
            out.append(_annotate_sent_xml(inner, span_fn))
            out.append(pieces[j].raw if j < len(pieces) else "</chunk>")
            i = j + 1
        else:
            out.append(p.raw)
            i += 1
    return "".join(out)


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
