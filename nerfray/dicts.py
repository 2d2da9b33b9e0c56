"""Lexical dictionaries: feature dicts (dictB) + entity-linking alias table.

Reference semantics re-expressed (SURVEY.md §2.1 S6-S12, §2.2 M16/M20/M21,
§2.5 A2-A4):

- ``build_dict``  — group forms, union label sets
  (fromListWith S.union, /root/reference/src/NLP/Nerf/Dict/Base.hs:62-67)
- ``merge``       — n-way union with set-union on conflict (Base.hs:85-97)
- ``diff``        — prefix labels with a per-dict id for provenance
  (Base.hs:99-116)
- ``sift`` / ``atomic`` — predicate filter; drop multi-word forms
  (Base.hs:42-44,73-75; Dict.hs:24-26)

The DAWG compression of the reference is a non-goal at our dict sizes
(SURVEY.md §7.5); a plain dict is the broadcast-small-side lookup table
(ray.put once, read in every actor — SURVEY.md §2.4 J1).

The *linker* alias table maps a normalized surface form to candidate
(canon_id, label, weight) rows; linking = argmax weight among candidates
whose label matches the tagged span label (BASELINE.json north_star).
"""

from __future__ import annotations

from . import corpus
from .core.schema import DictTable

# ---------------------------------------------------------------------------
# generic dict algebra (reference Dict/Base.hs)
# ---------------------------------------------------------------------------


def is_multiword(form: str) -> bool:
    """Base.hs:42-44: more than one space-separated word."""
    return len(form.split(" ")) != 1


def build_dict(pairs: list[tuple[str, str]], atomic: bool = True) -> DictTable:
    """(form, label) pairs -> form -> sorted label tuple (set-union on
    duplicate forms). ``atomic`` drops multi-word forms (Dict.hs:24-26)."""
    acc: dict[str, set[str]] = {}
    for form, label in pairs:
        if atomic and is_multiword(form):
            continue
        acc.setdefault(form, set()).add(label)
    return {f: tuple(sorted(ls)) for f, ls in acc.items()}


def merge(dicts: list[DictTable]) -> DictTable:
    acc: dict[str, set[str]] = {}
    for d in dicts:
        for f, ls in d.items():
            acc.setdefault(f, set()).update(ls)
    return {f: tuple(sorted(ls)) for f, ls in acc.items()}


def diff(dicts: list[DictTable]) -> DictTable:
    """Namespace labels with their dict's index before merging."""
    return merge([{f: tuple(f"{idx}:{l}" for l in ls) for f, ls in d.items()}
                  for idx, d in enumerate(dicts)])


def sift(pred, d: DictTable) -> DictTable:
    """Keep entries satisfying pred(form, labels) (Base.hs:73-75)."""
    return {f: ls for f, ls in d.items() if pred(f, ls)}


# ---------------------------------------------------------------------------
# dict artifacts (reference Dict/Base.hs:77-83 saveDict/loadDict — S12)
# ---------------------------------------------------------------------------


def save_dict(d: DictTable, path: str) -> None:
    """Persist a dict as a parquet artifact (form, labels) sorted by
    form — the columnar analog of the reference's DAWG file. Atomic-ish
    for single writers (parquet write then visible at path)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    forms = sorted(d)
    pq.write_table(pa.Table.from_pydict({
        "form": pa.array(forms, pa.string()),
        "labels": pa.array([list(d[f]) for f in forms],
                           pa.list_(pa.string())),
    }), path)


def load_dict(path: str) -> DictTable:
    """Load a dict artifact written by ``save_dict`` (round-trip exact:
    tests/test_dicts_lexicons.py::test_dict_artifact_round_trip)."""
    import pyarrow.parquet as pq
    t = pq.read_table(path)
    return {f: tuple(ls)
            for f, ls in zip(t.column("form").to_pylist(),
                             t.column("labels").to_pylist())}


def user_dict_from_file(path: str, fmt: str = "auto",
                        atomic: bool = True) -> DictTable:
    """Load a USER-SUPPLIED lexicon file into a DictTable, ready to wire
    into ``schema.default_conf(ne_dicts=[...])`` (the reference's
    ``Dict.hs`` CLI path: resource file -> dict -> schema).

    ``fmt``: 'parquet' (a save_dict artifact), 'polimorf', 'nelexicon',
    'prolexbase', or 'auto' (by extension: .parquet else tab-separated
    polimorf)."""
    from .sources import lexicons
    if fmt == "auto":
        fmt = "parquet" if path.endswith(".parquet") else "polimorf"
    if fmt == "parquet":
        return load_dict(path)
    with open(path, encoding="utf-8") as f:
        text = f.read()
    pairs = {
        "polimorf": lexicons.parse_polimorf,
        "nelexicon": lexicons.parse_nelexicon,
        "prolexbase": lexicons.parse_prolexbase,
    }[fmt](text)
    return build_dict(pairs, atomic=atomic)


# ---------------------------------------------------------------------------
# the engine's NE dictionaries (synthetic lexical resources)
# ---------------------------------------------------------------------------


def ne_dicts() -> list[tuple[str, DictTable]]:
    """Named-entity dictionaries wired into the schema at offsets [-1, 0]
    (defaultConf, Schema.hs:309-322)."""
    lib_pairs = [(lib, "library") for lib in corpus.LIBS]
    lib_pairs += [(lib, "module") for lib in corpus.LIBS]  # multi-label forms
    api_pairs = [(f"{lib}.{m}", "api")
                 for lib in corpus.LIBS for m in corpus.METHODS]
    lic_words: list[tuple[str, str]] = []
    for name in corpus.LICENSE_NAMES:
        ws = name.split(" ")
        lic_words.append((ws[0], "vendor"))
        for w in ws:
            lic_words.append((w, "licword"))
        lic_words.append((name, "license"))  # multiword: dropped by atomic
    return [
        ("lib", build_dict(lib_pairs)),
        ("api", build_dict(api_pairs)),
        ("lic", build_dict(lic_words)),
    ]


def int_triggers() -> DictTable:
    """Internal triggers (fire at offset [0]; Dict.hs:60-79 analog)."""
    return build_dict([(w, "trig") for w in
                       ["Licensed", "import", "def", "function", "func",
                        "const", "public"]])


def ext_triggers() -> DictTable:
    """External triggers (fire at offset [-1])."""
    return build_dict([(w, "trig") for w in
                       ["the", "import", "def", "function", "func", "const",
                        "void", '"', "="]])


# ---------------------------------------------------------------------------
# linker alias table
# ---------------------------------------------------------------------------

# form -> tuple of (canon_id, label, weight), weight-descending
AliasTable = dict[str, tuple[tuple[str, str, float], ...]]


def normalize_surface(s: str) -> str:
    return " ".join(s.lower().split())


def alias_table() -> AliasTable:
    rows: list[tuple[str, str, str, float]] = []
    for lib in corpus.LIBS:
        rows.append((lib, f"lib:{lib}", "library", 1.0))
        # deliberate ambiguity: the bare form also names an api namespace with
        # a lower prior, exercising argmax link scoring
        rows.append((lib, f"api:{lib}", "api", 0.3))
        for m in corpus.METHODS:
            rows.append((f"{lib}.{m}", f"api:{lib}.{m}", "api", 1.0))
    for name, lic in zip(corpus.LICENSE_NAMES, corpus.LICENSES):
        rows.append((normalize_surface(name), f"license:{lic}", "license", 1.0))
    acc: dict[str, list[tuple[str, str, float]]] = {}
    for form, canon, label, w in rows:
        acc.setdefault(form, []).append((canon, label, w))
    return {f: tuple(sorted(cs, key=lambda c: (-c[2], c[0])))
            for f, cs in acc.items()}


def link(surface: str, label: str,
         aliases: AliasTable) -> tuple[str | None, float]:
    """argmax-weight candidate whose label matches the span label.

    ``symbol`` spans are open-vocabulary: canonical id is derived from the
    normalized surface itself. Unlinkable spans return (None, 0.0).
    """
    if label == "symbol":
        return "sym:" + surface, 1.0
    cands = aliases.get(normalize_surface(surface))
    if cands:
        for canon, clabel, w in cands:  # already weight-descending
            if clabel == label:
                return canon, w
    return None, 0.0
