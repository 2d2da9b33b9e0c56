"""Observation-extraction schema (feature templates).

Reference: /root/reference/src/NLP/Nerf/Schema.hs (SURVEY.md §2.2 M6-M17).
A ``SchemaConf`` lists which feature blocks are active and at which relative
token offsets; it is serialized with the model so NER-time extraction
exactly matches train-time extraction (Schema.hs:277-294). Block order and
offsets are part of each observation's identity (the reference's Ox index
path, SURVEY.md §8.4) — we encode an observation as the string
``"{block}.{sub}@{offset}={value}"``.

Blocks (reference cites):
- orth          Schema.hs:105-108
- split_orth    Schema.hs:112-120 (lowercased form + original iff any upper)
- low_prefixes  Schema.hs:123-129
- low_suffixes  Schema.hs:132-138
- lemma         Schema.hs:141-153 (prefix+suffix trims 0,-1..-n, grouped)
- shape         Schema.hs:156-161
- packed        Schema.hs:164-170
- shape_pair    Schema.hs:183-190 (shape[k-1] ++ "-" ++ shape[k])
- packed_pair   Schema.hs:194-202
- dict blocks   Schema.hs:206-212 (exact surface-form lookup -> label set)

``default_conf`` mirrors the reference's ``defaultConf`` offsets
(Schema.hs:309-322): splitOrth@[-1,0]; lowSuffixes[2,3,4]@[0]; lemma(3)@
[-1,0]; shape@[-1,0]; packed@[-1,0]; shapePair@[0]; packedPair@[0];
NE-dicts@[-1,0]; internal-triggers@[0]; external-triggers@[-1].
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from . import ox

# A lexical dictionary for dictB-style blocks: surface form -> sorted labels.
DictTable = dict[str, tuple[str, ...]]

# User-extension surface (reference Block/Schema combinator API,
# Schema.hs:66-103; SURVEY.md §2.10): a custom block is a named callable
# (words, j) -> [(subkey, value)] registered at import time in every
# process (the reference likewise requires block code to exist at both
# train and tag time); SchemaConf references blocks by name only.
BlockFn = Callable[[list[str], int], list[tuple[str, str]]]
CUSTOM_BLOCKS: dict[str, BlockFn] = {}


def register_block(name: str, fn: BlockFn) -> None:
    """Register (or replace) a custom feature block."""
    CUSTOM_BLOCKS[name] = fn


@dataclass
class SchemaConf:
    """Which blocks are active, at which relative offsets, with which args.

    ``dicts`` maps a stable dict name -> (DictTable, offsets); the tables
    themselves ride with the model artifact (the reference embeds its DAWGs
    in the schema config the same way, Main.hs:196-223).
    """
    orth: list[int] | None = None
    split_orth: list[int] | None = None
    low_prefixes: tuple[list[int], list[int]] | None = None  # (lengths, offsets)
    low_suffixes: tuple[list[int], list[int]] | None = None
    lemma: tuple[int, list[int]] | None = None               # (max trim n, offsets)
    shape: list[int] | None = None
    packed: list[int] | None = None
    shape_pair: list[int] | None = None
    packed_pair: list[int] | None = None
    dicts: list[tuple[str, DictTable, list[int]]] = field(default_factory=list)
    custom: list[tuple[str, list[int]]] = field(default_factory=list)

    def to_config(self) -> dict:
        """JSON-serializable form (dict tables included)."""
        return {
            "orth": self.orth,
            "split_orth": self.split_orth,
            "low_prefixes": self.low_prefixes,
            "low_suffixes": self.low_suffixes,
            "lemma": self.lemma,
            "shape": self.shape,
            "packed": self.packed,
            "shape_pair": self.shape_pair,
            "packed_pair": self.packed_pair,
            "dicts": [[name, {k: list(v) for k, v in table.items()}, offs]
                      for name, table, offs in self.dicts],
            "custom": [[name, offs] for name, offs in self.custom],
        }

    @classmethod
    def from_config(cls, cfg: dict) -> "SchemaConf":
        def pair(v):
            return tuple(v) if v is not None else None
        return cls(
            orth=cfg.get("orth"),
            split_orth=cfg.get("split_orth"),
            low_prefixes=pair(cfg.get("low_prefixes")),
            low_suffixes=pair(cfg.get("low_suffixes")),
            lemma=pair(cfg.get("lemma")),
            shape=cfg.get("shape"),
            packed=cfg.get("packed"),
            shape_pair=cfg.get("shape_pair"),
            packed_pair=cfg.get("packed_pair"),
            dicts=[(name, {k: tuple(v) for k, v in table.items()}, offs)
                   for name, table, offs in cfg.get("dicts", [])],
            custom=[(name, offs) for name, offs in cfg.get("custom", [])],
        )


def default_conf(ne_dicts: list[tuple[str, DictTable]] | None = None,
                 int_dict: DictTable | None = None,
                 ext_dict: DictTable | None = None) -> SchemaConf:
    """Reference ``defaultConf`` (Schema.hs:309-322) offsets."""
    dicts: list[tuple[str, DictTable, list[int]]] = []
    for name, table in (ne_dicts or []):
        dicts.append((name, table, [-1, 0]))
    if int_dict is not None:
        dicts.append(("int_trigger", int_dict, [0]))
    if ext_dict is not None:
        dicts.append(("ext_trigger", ext_dict, [-1]))
    return SchemaConf(
        split_orth=[-1, 0],
        low_suffixes=([2, 3, 4], [0]),
        lemma=(3, [-1, 0]),
        shape=[-1, 0],
        packed=[-1, 0],
        shape_pair=[0],
        packed_pair=[0],
        dicts=dicts,
    )


def schematize(conf: SchemaConf, words: list[str]) -> list[set[str]]:
    """Per-token observation sets (the reference's ``CRF.Sent Ob``,
    Schema.hs:357-362). Pure, deterministic; OOV handling lives in the CRF
    (unknown observations are inert, SURVEY.md §8.2)."""
    n = len(words)
    lower = [w.lower() for w in words]
    obs: list[set[str]] = [set() for _ in range(n)]

    def save(k: int, key: str, val: str | None) -> None:
        if val is not None:
            obs[k].add(f"{key}={val}")

    def each(offsets: list[int]):
        for k in range(n):
            for o in offsets:
                j = k + o
                if 0 <= j < n:
                    yield k, o, j

    bi = 0  # block index in declaration order — part of observation identity
    if conf.orth is not None:
        for k, o, j in each(conf.orth):
            save(k, f"{bi}.0@{o}", words[j])
    bi += 1
    if conf.split_orth is not None:
        for k, o, j in each(conf.split_orth):
            save(k, f"{bi}.0@{o}", lower[j])
            if any(c.isupper() for c in words[j]):
                save(k, f"{bi}.1@{o}", words[j])
    bi += 1
    if conf.low_prefixes is not None:
        lengths, offsets = conf.low_prefixes
        for k, o, j in each(offsets):
            for si, ln in enumerate(lengths):
                save(k, f"{bi}.{si}@{o}", ox.prefix(ln, lower[j]))
    bi += 1
    if conf.low_suffixes is not None:
        lengths, offsets = conf.low_suffixes
        for k, o, j in each(offsets):
            for si, ln in enumerate(lengths):
                save(k, f"{bi}.{si}@{o}", ox.suffix(ln, lower[j]))
    bi += 1
    if conf.lemma is not None:
        ntrim, offsets = conf.lemma
        for k, o, j in each(offsets):
            for si, trim in enumerate(range(0, -ntrim - 1, -1)):
                save(k, f"{bi}.p{si}@{o}", ox.prefix(trim, lower[j]))
                save(k, f"{bi}.s{si}@{o}", ox.suffix(trim, lower[j]))
    bi += 1
    shapes = [ox.shape(w) for w in words]
    if conf.shape is not None:
        for k, o, j in each(conf.shape):
            save(k, f"{bi}.0@{o}", shapes[j])
    bi += 1
    if conf.packed is not None:
        for k, o, j in each(conf.packed):
            save(k, f"{bi}.0@{o}", ox.pack(shapes[j]))
    bi += 1
    if conf.shape_pair is not None:
        for k, o, j in each(conf.shape_pair):
            if j - 1 >= 0:
                save(k, f"{bi}.0@{o}", shapes[j - 1] + "-" + shapes[j])
    bi += 1
    if conf.packed_pair is not None:
        for k, o, j in each(conf.packed_pair):
            if j - 1 >= 0:
                save(k, f"{bi}.0@{o}",
                     ox.pack(shapes[j - 1]) + "-" + ox.pack(shapes[j]))
    bi += 1
    for name, table, offsets in conf.dicts:
        for k, o, j in each(offsets):
            labels = table.get(words[j])
            if labels:
                for lbl in labels:  # Ox `saves`: one index, many values
                    save(k, f"{bi}.{name}@{o}", lbl)
        bi += 1
    for name, offsets in conf.custom:
        fn = CUSTOM_BLOCKS.get(name)
        if fn is None:
            raise KeyError(f"custom block {name!r} is not registered "
                           f"(register_block before schematize)")
        for k, o, j in each(offsets):
            for sub, val in fn(words, j):
                save(k, f"{bi}.{name}.{sub}@{o}", val)
        bi += 1
    return obs
