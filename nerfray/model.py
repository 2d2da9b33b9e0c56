"""Model lifecycle: training data, CRF training, artifact cache, tagging.

Mirrors the reference's train/ner flows (/root/reference/src/NLP/Nerf.hs:
43-99; SURVEY.md §3.1-3.2): gold spans are IOB-encoded into joined labels,
observations extracted with the schema, a first-order CRF trained by SGD
with the reference's hyperparameter defaults, and tagging runs
tokenize -> schematize -> Viterbi -> IOB-decode fused in one pass (the
wide observation intermediate never leaves the worker, SURVEY.md §1.2).

The trained artifact (CRF weights + vocab + SchemaConf JSON) is cached on
disk keyed by a version/config fingerprint; Ray actors receive its bytes
via ``ray.put`` and deserialize once in ``__init__`` (the reference's
resident-model server mode, Server.hs:32-48, re-expressed as an actor pool).

``RuleTagger`` is a deterministic pattern-based tagger over the same span
schema — used as a distant-supervision baseline and as an independently
SQL-oracled pipeline variant.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import tempfile

from . import corpus, dicts
from .core import crf, iob, schema
from .core.tokenize import Token, tokenize

MODEL_VERSION = 4
N_TRAIN = 1200
CACHE_DIR = os.environ.get("NERFRAY_CACHE", "/tmp/nerfray_cache")


def make_schema_conf() -> schema.SchemaConf:
    conf = schema.default_conf(ne_dicts=dicts.ne_dicts(),
                               int_dict=dicts.int_triggers(),
                               ext_dict=dicts.ext_triggers())
    # code tokens benefit from the raw surface at a small window
    conf.orth = [-2, -1, 0, 1]
    return conf


def char_spans_to_token_spans(tokens: list[Token],
                              spans: list[iob.Span]) -> list[iob.Span]:
    """Char-offset spans -> token-index spans (tokens overlapping the span)."""
    out = []
    for sp in spans:
        lo = hi = None
        for j, t in enumerate(tokens):
            if t.start < sp.end and t.end > sp.start:
                if lo is None:
                    lo = j
                hi = j + 1
        if lo is not None:
            out.append(iob.Span(sp.label, lo, hi, sp.depth))
    return sorted(out, key=lambda s: (s.start, -s.end, s.depth))


def token_spans_to_char_spans(tokens: list[Token],
                              spans: list[iob.Span]) -> list[iob.Span]:
    return [iob.Span(sp.label, tokens[sp.start].start,
                     tokens[sp.end - 1].end, sp.depth) for sp in spans]


def training_corpus(n_train: int = N_TRAIN) -> list[tuple[str, list[iob.Span]]]:
    """(line, gold char spans) units from the disjoint training index range."""
    units = []
    for i in range(corpus.TRAIN_OFFSET, corpus.TRAIN_OFFSET + n_train):
        units.extend(corpus.row_lines(i, n_train))
    return units


def train_model(conf: schema.SchemaConf | None = None,
                n_train: int = N_TRAIN,
                args: crf.SgdArgs | None = None) -> crf.Crf:
    """IOB-encode + schematize the gold units and run SGD (Nerf.hs:43-50,
    85-91). Fully deterministic (seeded shuffle, sorted vocab)."""
    conf = conf or make_schema_conf()
    sents: list[list[set[str]]] = []
    labels: list[list[str]] = []
    for text, gspans in training_corpus(n_train):
        toks = tokenize(text)
        tspans = char_spans_to_token_spans(toks, gspans)
        stacks = iob.encode(tspans, len(toks))
        sents.append(schema.schematize(conf, [t.text for t in toks]))
        labels.append([iob.stack_to_str(s) for s in stacks])
    return crf.train(sents, labels, args or crf.SgdArgs(iter_num=6))


def _fingerprint() -> str:
    key = json.dumps({"v": MODEL_VERSION, "n": N_TRAIN,
                      "cv": corpus.CORPUS_VERSION}, sort_keys=True)
    return hashlib.sha256(key.encode()).hexdigest()[:16]


def model_artifact() -> bytes:
    """Train-or-load the default model artifact; atomic disk cache so
    concurrent callers race safely."""
    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, f"model_{_fingerprint()}.bin")
    if os.path.exists(path):
        with open(path, "rb") as f:
            return f.read()
    conf = make_schema_conf()
    model = train_model(conf)
    blob = serialize(model, conf)
    fd, tmp = tempfile.mkstemp(dir=CACHE_DIR)
    with os.fdopen(fd, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return blob


def serialize(model: crf.Crf, conf: schema.SchemaConf) -> bytes:
    """Model artifact = length-prefixed (SchemaConf JSON, CRF npz) — the
    analog of the reference's Data.Binary ``Nerf{schemaConf, crf}`` file
    (Nerf.hs:35-41)."""
    cfg = json.dumps(conf.to_config()).encode()
    crf_bytes = model.to_bytes()
    return len(cfg).to_bytes(8, "little") + cfg + crf_bytes


def deserialize(blob: bytes) -> tuple[crf.Crf, schema.SchemaConf]:
    ln = int.from_bytes(blob[:8], "little")
    conf = schema.SchemaConf.from_config(json.loads(blob[8:8 + ln].decode()))
    model = crf.Crf.from_bytes(blob[8 + ln:])
    return model, conf


def cross_validate(k: int = 3, n_train: int = 300,
                   args: crf.SgdArgs | None = None) -> list[dict]:
    """K-fold cross validation (the reference's ``cv`` mode,
    /root/reference/app/Main.hs:251-271): partition the gold units into k
    folds; for each, train on the other k-1 and score the held-out fold
    with the reference's span-matching semantics. Returns per-fold
    {fold, n_eval, tp, fp, fn, precision, recall}."""
    from .core import compare
    units = training_corpus(n_train)
    conf = make_schema_conf()
    folds = [units[f::k] for f in range(k)]
    out = []
    for f in range(k):
        train_units = [u for g in range(k) if g != f for u in folds[g]]
        sents, labels = [], []
        for text, gspans in train_units:
            toks = tokenize(text)
            tspans = char_spans_to_token_spans(toks, gspans)
            stacks = iob.encode(tspans, len(toks))
            sents.append(schema.schematize(conf, [t.text for t in toks]))
            labels.append([iob.stack_to_str(s) for s in stacks])
        m = crf.train(sents, labels, args or crf.SgdArgs(iter_num=4))
        tagger = Tagger(m, conf)
        stats = []
        for text, gspans in folds[f]:
            pred = tagger.tag(text)
            stats.append(compare.unit_stats(
                text, [(s.label, s.start, s.end) for s in gspans],
                [(s.label, s.start, s.end) for s in pred]))
        merged = compare.merge(stats)
        tp = sum(v[0] for v in merged.values())
        fp = sum(v[1] for v in merged.values())
        fn = sum(v[2] for v in merged.values())
        p, r, _ = compare.prf(tp, fp, fn)
        out.append({"fold": f, "n_eval": len(folds[f]), "tp": tp, "fp": fp,
                    "fn": fn, "precision": p, "recall": r})
    return out


class Tagger:
    """tokenize -> schematize -> Viterbi -> IOB-decode, one unit at a time
    (the reference's ``ner`` composition, Nerf.hs:94-99). The schema is
    materialized once per instance, not per sentence (the reference rebuilds
    it per sentence — an inefficiency we do not copy, SURVEY.md §3.1)."""

    def __init__(self, model: crf.Crf, conf: schema.SchemaConf):
        self.model = model
        self.conf = conf

    def tag(self, text: str) -> list[iob.Span]:
        """Char-offset spans for one unit."""
        toks = tokenize(text)
        if not toks:
            return []
        obs = schema.schematize(self.conf, [t.text for t in toks])
        stacks = [iob.stack_from_str(s) for s in self.model.viterbi(obs)]
        return token_spans_to_char_spans(toks, iob.decode(stacks))


class RuleTagger:
    """Deterministic pattern tagger over the same span schema.

    Patterns encode the corpus templates directly (import/def/call/license
    lines); serves as the distant-supervision baseline and the fully
    SQL-oracled pipeline variant.
    """

    _LIC = re.compile(r"Licensed under the (.+)$")
    _IMPORTS = [re.compile(p) for p in (
        r"^import (\w+)$",            # python
        r"^const (\w+) = require",    # js
        r'^import "(\w+)"$',          # go
        r"^import (\w+);$",           # java
    )]
    _DEFS = [re.compile(p) for p in (
        r"^def (\w+)\(\):$",
        r"^function (\w+)\(\) \{$",
        r"^func (\w+)\(\) \{$",
        r"^public void (\w+)\(\) \{$",
    )]
    _CALL = re.compile(r"(\w+\.\w+)\(\)")

    def tag(self, text: str) -> list[iob.Span]:
        spans: list[iob.Span] = []
        m = self._LIC.search(text)
        if m:
            spans.append(iob.Span("license", m.start(1), m.end(1), 0))
            vend = m.group(1).split(" ", 1)[0]
            spans.append(iob.Span("vendor", m.start(1),
                                  m.start(1) + len(vend), 1))
        for rx in self._IMPORTS:
            m = rx.match(text)
            if m:
                spans.append(iob.Span("library", m.start(1), m.end(1), 0))
                break
        for rx in self._DEFS:
            m = rx.match(text)
            if m:
                spans.append(iob.Span("symbol", m.start(1), m.end(1), 0))
                break
        m = self._CALL.search(text)
        if m:
            spans.append(iob.Span("api", m.start(1), m.end(1), 0))
        return sorted(spans, key=lambda s: (s.start, -s.end, s.depth))
