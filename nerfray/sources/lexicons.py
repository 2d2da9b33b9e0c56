"""Lexical-resource readers (reference dict formats, SURVEY.md §2.1 S6-S10).

The reference ships five readers for Polish lexical resources; we reproduce
their *formats and filtering semantics* over synthetic data (the resources
themselves are not public-redistributable and are irrelevant to the code
domain). Each reader returns (form, label) pairs for ``dicts.build_dict``.

- PoliMorf   TSV ``form<TAB>base<TAB>tag<TAB>cat``; keep (form, cat), drop
  empty cats and cat == "pospolita" (common nouns)
  (/root/reference/src/NLP/Nerf/Dict.hs:42-51)
- NELexicon  lines ``type; form`` split on the first ``;``, with the
  separator being "; " (two chars)  (Dict/NELexicon.hs:14-20)
- Prolexbase TSV ``form<TAB>base<TAB>tag<TAB>cat``; keep (form, cat)
  (Dict/Prolexbase.hs:15-21)
- PNET       TSV ``orth<TAB>base<TAB>tag<TAB>typ<TAB>neTyp<TAB>example``;
  typ is "int" or "ext", selecting internal/external trigger
  dictionaries (Dict/PNET.hs:41-53, Dict.hs:60-79)
- PNEG       LMF XML: LexicalEntry -> writtenForm feats x sense label
  (Dict/PNEG.hs:19-44); parsed with a minimal element scan.
"""

from __future__ import annotations

import re


def parse_polimorf(text: str) -> list[tuple[str, str]]:
    out = []
    for line in text.splitlines():
        if not line.strip():
            continue
        parts = line.split("\t")
        form, cat = parts[0], parts[-1]
        if cat and cat != "pospolita":
            out.append((form, cat))
    return out


def parse_nelexicon(text: str) -> list[tuple[str, str]]:
    out = []
    for line in text.splitlines():
        if "; " not in line:
            continue
        typ, form = line.split("; ", 1)
        out.append((form, typ))
    return out


def parse_prolexbase(text: str) -> list[tuple[str, str]]:
    out = []
    for line in text.splitlines():
        parts = line.split("\t")
        if len(parts) >= 4:
            out.append((parts[0], parts[3]))
    return out


def parse_pnet(text: str) -> list[dict]:
    """Rows with keys orth/base/tag/typ/ne_typ/example."""
    rows = []
    for line in text.splitlines():
        parts = line.split("\t")
        if len(parts) >= 6:
            rows.append(dict(zip(
                ["orth", "base", "tag", "typ", "ne_typ", "example"], parts)))
    return rows


def pnet_triggers(rows: list[dict], typ: str) -> list[tuple[str, str]]:
    """typ in {"int", "ext"} — split into internal/external trigger dicts."""
    return [(r["orth"], r["ne_typ"]) for r in rows if r["typ"] == typ]


_ENTRY_RE = re.compile(r"<LexicalEntry\b.*?</LexicalEntry>", re.S)
_FEAT_RE = re.compile(r"<feat\s+att=\"(\w+)\"\s+val=\"([^\"]*)\"\s*/?>")


def parse_pneg(xml: str) -> list[tuple[str, str]]:
    """LMF: for each LexicalEntry, every writtenForm x its externalReference
    / label sense feats (Dict/PNEG.hs:19-44)."""
    out = []
    for entry in _ENTRY_RE.findall(xml):
        forms = [v for a, v in _FEAT_RE.findall(entry)
                 if a == "writtenForm"]
        senses = [v for a, v in _FEAT_RE.findall(entry)
                  if a in ("externalReference", "label")]
        for f in forms:
            for s in senses:
                out.append((f, s))
    return out
