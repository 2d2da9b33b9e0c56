"""Deterministic synthetic source-code corpus (the BASELINE.json input table).

Schema per BASELINE.json ``input_hint``:
    (repo: string, path: string, commit: string, lang: string, content: string)

Every field of row ``i`` (given the total row count ``n``) is a pure integer-
arithmetic function of ``i`` — no RNG — so the gold span set and gold triple
set are known by construction AND expressible in ANSI SQL (see
``gold_triples_sql``), which gives the full CRF pipeline a DuckDB oracle
(FIXTURES.md F1/F5). Planted mentions:

- a license header  -> (repo, licensed-under, license:<spdx>)
- 1..3 import lines -> (repo, imports, lib:<name>)
- 1..2 def lines    -> (file, defines, sym:<name>)
- 1..2 call lines   -> (file, calls,   api:<lib>.<method>)

License spans are multi-token with a nested depth-1 ``vendor`` span on the
first token, exercising the reference's joined-label nested encoding
(/root/reference/README.md:6-14; SURVEY.md §8.1).

Row count convention: n = row count of ``documents.parquet`` in the same
sf directory (1:1), so oracle SQL can derive n from a registered view.
Training data uses a disjoint index range (i + TRAIN_OFFSET) of the same
generator.
"""

from __future__ import annotations

import hashlib

from .core.iob import Span

LANGS = ["python", "js", "go", "java"]
EXTS = {"python": ".py", "js": ".js", "go": ".go", "java": ".java"}

# 17 (prime) library names: j < 3 gives distinct (i*7 + j*13) % 17.
LIBS = ["os", "sys", "json", "math", "time", "re", "numpy", "pandas",
        "requests", "flask", "django", "torch", "scipy", "sklearn",
        "boto3", "yaml", "click"]
METHODS = ["load", "dump", "connect", "read", "write", "parse", "init"]
LICENSES = ["MIT", "Apache-2.0", "BSD-3-Clause", "GPL-3.0", "MPL-2.0"]
LICENSE_NAMES = ["MIT License", "Apache License 2.0", "BSD 3-Clause License",
                 "GNU General Public License v3", "Mozilla Public License 2.0"]
FILLERS = ["TODO: handle edge cases", "NOTE: see the docs for details",
           "FIXME: refactor once stable"]

TRAIN_OFFSET = 1_000_000  # training rows come from a disjoint index range
CORPUS_VERSION = 2


def n_repos(n: int) -> int:
    return max(1, n // 10)


def repo_of(i: int, n: int) -> str:
    return f"org/repo-{i % n_repos(n)}"


def path_of(i: int, lang: str) -> str:
    return f"src/mod_{i}{EXTS[lang]}"


def commit_of(repo: str, path: str) -> str:
    return hashlib.sha256(f"{repo}:{path}".encode()).hexdigest()[:40]


def _line(parts: list[tuple[str, str | None, int]]) -> tuple[str, list[Span]]:
    """Assemble a line from (text, label|None, depth) pieces, recording char
    spans for labelled pieces. Pieces with depth>0 nest inside the previous
    depth-0 piece's span (only used for the license vendor token)."""
    text = ""
    spans: list[Span] = []
    for piece, label, depth in parts:
        start = len(text)
        text += piece
        if label is not None:
            spans.append(Span(label, start, len(text), depth))
    return text, spans


def row_fields(i: int, n: int) -> dict:
    lang = LANGS[i % 4]
    repo = repo_of(i, n)
    path = path_of(i, lang)
    return {"i": i, "lang": lang, "repo": repo, "path": path,
            "commit": commit_of(repo, path)}


def planted(i: int) -> dict:
    """The triple-relevant arithmetic choices for row i (mirrored in SQL)."""
    libs = [LIBS[(i * 7 + j * 13) % 17] for j in range(1 + i % 3)]
    methods = [METHODS[(i + j) % 7] for j in range(1 + i % 2)]
    return {
        "license_id": LICENSES[i % 5],
        "license_name": LICENSE_NAMES[i % 5],
        "libs": libs,
        "apis": [f"{libs[0]}.{m}" for m in methods],
        "syms": [f"func_{(i * 31) % 997}"]
                + ([f"helper_{(i * 13) % 997}"] if i % 2 == 0 else []),
    }


def row_lines(i: int, n: int) -> list[tuple[str, list[Span]]]:
    """Content lines with gold char-offset spans (label, start, end, depth)."""
    lang = LANGS[i % 4]
    p = planted(i)
    c = "#" if lang == "python" else "//"
    lic = p["license_name"]
    vendor, rest = lic.split(" ", 1)
    lines: list[tuple[str, list[Span]]] = []

    # license header: nested vendor span (depth 1) inside license span
    text = f"{c} Licensed under the "
    lstart = len(text)
    text += lic
    lines.append((text, [Span("license", lstart, len(text), 0),
                         Span("vendor", lstart, lstart + len(vendor), 1)]))

    for lib in p["libs"]:
        if lang == "python":
            lines.append(_line([("import ", None, 0), (lib, "library", 0)]))
        elif lang == "js":
            lines.append(_line([("const ", None, 0), (lib, "library", 0),
                                (f' = require("{lib}")', None, 0)]))
        elif lang == "go":
            lines.append(_line([('import "', None, 0), (lib, "library", 0),
                                ('"', None, 0)]))
        else:
            lines.append(_line([("import ", None, 0), (lib, "library", 0),
                                (";", None, 0)]))

    lines.append((f"{c} {FILLERS[i % 3]}", []))

    # distractor: trigger words and a library name INSIDE a comment — gold
    # has no spans here; the CRF must use context (comment marker at
    # offset -2/-1) to suppress, i.e. it does contextual disambiguation,
    # not surface-form memorization
    dlib = LIBS[(i * 11 + 5) % 17]
    lines.append((f"{c} import the {dlib} helper before use", []))

    def def_line(sym: str) -> tuple[str, list[Span]]:
        if lang == "python":
            return _line([("def ", None, 0), (sym, "symbol", 0),
                          ("():", None, 0)])
        if lang == "js":
            return _line([("function ", None, 0), (sym, "symbol", 0),
                          ("() {", None, 0)])
        if lang == "go":
            return _line([("func ", None, 0), (sym, "symbol", 0),
                          ("() {", None, 0)])
        return _line([("public void ", None, 0), (sym, "symbol", 0),
                      ("() {", None, 0)])

    def call_line(api: str) -> tuple[str, list[Span]]:
        if lang == "python":
            return _line([("    result = ", None, 0), (api, "api", 0),
                          ("()", None, 0)])
        if lang == "js":
            return _line([("  const result = ", None, 0), (api, "api", 0),
                          ("();", None, 0)])
        if lang == "go":
            return _line([("\tresult := ", None, 0), (api, "api", 0),
                          ("()", None, 0)])
        return _line([("    int result = ", None, 0), (api, "api", 0),
                      ("();", None, 0)])

    syms = p["syms"]
    lines.append(def_line(syms[0]))
    for api in p["apis"]:
        lines.append(call_line(api))
    if lang == "python":
        lines.append(("    return result", []))
    elif lang == "js":
        lines.append(("  return result", []))
        lines.append(("}", []))
    elif lang == "go":
        lines.append(("\treturn", []))
        lines.append(("}", []))
    else:
        lines.append(("    return;", []))
        lines.append(("}", []))
    if len(syms) > 1:
        lines.append(def_line(syms[1]))
        if lang == "python":
            lines.append(("    return result", []))
        else:
            lines.append(("    return", []))
            lines.append(("}", []))
    return lines


def row_content(i: int, n: int) -> str:
    return "\n".join(t for t, _ in row_lines(i, n))


def synth_rows(indices, n: int) -> dict:
    """Columnar batch of corpus rows for the given row indices (the
    distributed generator body used from ``ray.data.range(n).map_batches``)."""
    cols = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
    for i in indices:
        i = int(i)
        f = row_fields(i, n)
        cols["repo"].append(f["repo"])
        cols["path"].append(f["path"])
        cols["commit"].append(f["commit"])
        cols["lang"].append(f["lang"])
        cols["content"].append(row_content(i, n))
    return cols


def gold_triples(i: int, n: int) -> set[tuple[str, str, str]]:
    """Gold (subj, pred, obj) set for row i — by construction."""
    f = row_fields(i, n)
    p = planted(i)
    repo, file = f["repo"], f["repo"] + "/" + f["path"]
    out = {(repo, "licensed-under", "license:" + p["license_id"])}
    for lib in p["libs"]:
        out.add((repo, "imports", "lib:" + lib))
    for sym in p["syms"]:
        out.add((file, "defines", "sym:" + sym))
    for api in p["apis"]:
        out.add((file, "calls", "api:" + api))
    return out


def gold_triples_all(n: int) -> set[tuple[str, str, str]]:
    out: set[tuple[str, str, str]] = set()
    for i in range(n):
        out |= gold_triples(i, n)
    return out


# ---------------------------------------------------------------------------
# SQL mirrors (DuckDB). n is derived from the registered `documents` view so
# the oracle is self-contained. Lists are 1-indexed in DuckDB.
# ---------------------------------------------------------------------------

def _sql_list(items: list[str]) -> str:
    return "[" + ", ".join("'" + s + "'" for s in items) + "]"


# documents.doc_id is contiguous 0..n-1 in every sf dir, so it serves as the
# corpus row index i (corpus rows are 1:1 with documents rows by convention).
ROWS_CTE = f"""
params AS (SELECT greatest(1, count(*) // 10)::BIGINT AS nrepos FROM documents),
rows AS (
  SELECT d.doc_id::BIGINT AS i,
         'org/repo-' || (d.doc_id % p.nrepos) AS repo,
         'src/mod_' || d.doc_id ||
           ({_sql_list([EXTS[lang] for lang in LANGS])})[1 + (d.doc_id % 4)] AS path,
         ({_sql_list(LANGS)})[1 + (d.doc_id % 4)] AS lang
  FROM params p, documents d
)
"""


def files_sql() -> str:
    """Mirror of the corpus file table (repo, path, commit, lang)."""
    return f"""
WITH {ROWS_CTE}
SELECT repo, path, substr(sha256(repo || ':' || path), 1, 40) AS commit, lang
FROM rows ORDER BY repo, path
"""


def gold_triples_sql(where_i: str = "TRUE") -> str:
    """Mirror of the deduped gold triple set; ``where_i`` filters the
    corpus row index (used by the incremental-delta oracle to mirror a
    corpus VERSION as a modular subset of rows)."""
    libs = _sql_list(LIBS)
    methods = _sql_list(METHODS)
    licenses = _sql_list(LICENSES)
    return f"""
WITH {ROWS_CTE},
rowsf AS (SELECT * FROM rows WHERE {where_i}),
lic AS (
  SELECT repo AS subj, 'licensed-under' AS pred,
         'license:' || ({licenses})[1 + (i % 5)] AS obj
  FROM rowsf
),
imp AS (
  SELECT repo AS subj, 'imports' AS pred,
         'lib:' || ({libs})[1 + ((i * 7 + j * 13) % 17)] AS obj
  FROM (SELECT i, repo, unnest(generate_series(0, i % 3)) AS j FROM rowsf)
),
defs AS (
  SELECT repo || '/' || path AS subj, 'defines' AS pred,
         'sym:func_' || ((i * 31) % 997) AS obj FROM rowsf
  UNION ALL
  SELECT repo || '/' || path, 'defines', 'sym:helper_' || ((i * 13) % 997)
  FROM rowsf WHERE i % 2 = 0
),
calls AS (
  SELECT repo || '/' || path AS subj, 'calls' AS pred,
         'api:' || ({libs})[1 + ((i * 7) % 17)] || '.' ||
                   ({methods})[1 + ((i + j) % 7)] AS obj
  FROM (SELECT i, repo, path, unnest(generate_series(0, i % 2)) AS j FROM rowsf)
)
SELECT DISTINCT subj, pred, obj
FROM (SELECT * FROM lic UNION ALL SELECT * FROM imp
      UNION ALL SELECT * FROM defs UNION ALL SELECT * FROM calls)
ORDER BY subj, pred, obj
"""


def unit_counts_sql() -> str:
    """Mirror of per-file unit (line) counts: 4 fixed lines (license,
    filler, distractor comment, first def) + imports + calls +
    returns-block + optional second def block — arithmetic of (i, lang),
    see row_lines."""
    return f"""
WITH {ROWS_CTE}
SELECT repo, path,
       (4 + (1 + i % 3) + (1 + i % 2)
          + CASE WHEN lang = 'python' THEN 1 ELSE 2 END
          + CASE WHEN i % 2 = 0
                 THEN CASE WHEN lang = 'python' THEN 2 ELSE 3 END
                 ELSE 0 END)::BIGINT AS n_units
FROM rows ORDER BY repo, path
"""


def pred_counts_sql() -> str:
    """Deduped gold triples per predicate."""
    return f"""
SELECT pred, count(*)::BIGINT AS n_triples
FROM ({gold_triples_sql()})
GROUP BY pred ORDER BY pred
"""


def eval_prf_sql() -> str:
    """Per-label tp/fp/fn of a perfect tagger (planted mention counts; the
    CRF must reproduce them exactly — pytest enforces the P/R gate first)."""
    return """
WITH rows AS (SELECT doc_id::BIGINT AS i FROM documents)
SELECT label, tp, 0::BIGINT AS fp, 0::BIGINT AS fn FROM (
  SELECT 'api' AS label, (SELECT sum(1 + i % 2) FROM rows)::BIGINT AS tp
  UNION ALL SELECT 'library', (SELECT sum(1 + i % 3) FROM rows)::BIGINT
  UNION ALL SELECT 'license', (SELECT count(*) FROM rows)::BIGINT
  UNION ALL SELECT 'symbol',
    (SELECT count(*) + count(*) FILTER (i % 2 = 0) FROM rows)::BIGINT
  UNION ALL SELECT 'vendor', (SELECT count(*) FROM rows)::BIGINT
) ORDER BY label
"""


def content_cte() -> str:
    """CTE chain (rows, rc, content) whose ``content`` column rebuilds
    row_content(i, n) byte-for-byte in DuckDB — every line template above
    mirrored as SQL string expressions — so sha256(content) (and any
    span arithmetic over lines) is oracle-expressible."""
    libs = _sql_list(LIBS)
    methods = _sql_list(METHODS)
    lic_names = _sql_list(LICENSE_NAMES)
    fillers = _sql_list(FILLERS)
    return f"""
{ROWS_CTE},
rc AS (
  SELECT i, repo, path, lang,
         CASE WHEN lang = 'python' THEN '#' ELSE '//' END AS c,
         ({lic_names})[1 + (i % 5)] AS lic_name,
         [({libs})[1 + ((i * 7 + j * 13) % 17)]
          FOR j IN generate_series(0, i % 3)] AS libs,
         [({libs})[1 + ((i * 7) % 17)] || '.' ||
          ({methods})[1 + ((i + j) % 7)]
          FOR j IN generate_series(0, i % 2)] AS apis,
         'func_' || ((i * 31) % 997) AS sym0,
         'helper_' || ((i * 13) % 997) AS sym1
  FROM rows
),
content AS (
  SELECT i, repo, path, lang,
    array_to_string(
      [c || ' Licensed under the ' || lic_name]
      || [CASE WHEN lang = 'python' THEN 'import ' || l
               WHEN lang = 'js'
                 THEN 'const ' || l || ' = require("' || l || '")'
               WHEN lang = 'go' THEN 'import "' || l || '"'
               ELSE 'import ' || l || ';' END FOR l IN libs]
      || [c || ' ' || ({fillers})[1 + (i % 3)]]
      || [c || ' import the ' || ({libs})[1 + ((i * 11 + 5) % 17)]
            || ' helper before use']
      || [CASE WHEN lang = 'python' THEN 'def ' || sym0 || '():'
               WHEN lang = 'js' THEN 'function ' || sym0 || '() {{'
               WHEN lang = 'go' THEN 'func ' || sym0 || '() {{'
               ELSE 'public void ' || sym0 || '() {{' END]
      || [CASE WHEN lang = 'python' THEN '    result = ' || a || '()'
               WHEN lang = 'js' THEN '  const result = ' || a || '();'
               WHEN lang = 'go' THEN chr(9) || 'result := ' || a || '()'
               ELSE '    int result = ' || a || '();' END FOR a IN apis]
      || CASE WHEN lang = 'python' THEN ['    return result']
              WHEN lang = 'js' THEN ['  return result', '}}']
              WHEN lang = 'go' THEN [chr(9) || 'return', '}}']
              ELSE ['    return;', '}}'] END
      || CASE WHEN i % 2 = 0 THEN
              [CASE WHEN lang = 'python' THEN 'def ' || sym1 || '():'
                    WHEN lang = 'js' THEN 'function ' || sym1 || '() {{'
                    WHEN lang = 'go' THEN 'func ' || sym1 || '() {{'
                    ELSE 'public void ' || sym1 || '() {{' END]
              || CASE WHEN lang = 'python' THEN ['    return result']
                      ELSE ['    return', '}}'] END
         ELSE []::VARCHAR[] END,
      chr(10)) AS content
  FROM rc
)
"""


def prov_triples_sql() -> str:
    """Mirror of triples_with_provenance: each gold triple with its
    MINIMAL provenance tuple — min over (path, unit_id, src_start,
    src_end), matching emit_triples_with_provenance's deterministic
    choice — plus content_sha = sha256 of the SQL-reconstructed content.

    Unit ids / char offsets are the row_lines layout as arithmetic:
    license at unit 0, import j at unit 1+j, the first def at unit
    4 + i%3, call j at unit 5 + i%3 + j, the optional second def at
    unit i%3 + i%2 + (7 python / 8 other); offsets are the per-language
    prefix lengths of the line templates."""
    libs = _sql_list(LIBS)
    methods = _sql_list(METHODS)
    lic_ids = _sql_list(LICENSES)
    return f"""
WITH {content_cte()},
shas AS (SELECT i, repo, path, sha256(content) AS content_sha FROM content),
m AS (
  SELECT repo AS subj, 'licensed-under' AS pred,
         'license:' || ({lic_ids})[1 + (i % 5)] AS obj,
         repo, path, i, 0 AS unit_id,
         CASE WHEN lang = 'python' THEN 21 ELSE 22 END AS src_start,
         CASE WHEN lang = 'python' THEN 21 ELSE 22 END
           + length(lic_name) AS src_end
  FROM rc
  UNION ALL
  SELECT repo, 'imports', 'lib:' || lib, repo, path, i, 1 + j,
         CASE lang WHEN 'python' THEN 7 WHEN 'js' THEN 6
                   WHEN 'go' THEN 8 ELSE 7 END,
         CASE lang WHEN 'python' THEN 7 WHEN 'js' THEN 6
                   WHEN 'go' THEN 8 ELSE 7 END + length(lib)
  FROM (SELECT i, repo, path, lang, j,
               ({libs})[1 + ((i * 7 + j * 13) % 17)] AS lib
        FROM rows, unnest(generate_series(0, i % 3)) AS t(j))
  UNION ALL
  SELECT repo || '/' || path, 'defines', 'sym:' || sym, repo, path, i,
         CASE WHEN nth = 0 THEN 4 + (i % 3)
              ELSE (i % 3) + (i % 2)
                   + CASE WHEN lang = 'python' THEN 7 ELSE 8 END END,
         CASE lang WHEN 'python' THEN 4 WHEN 'js' THEN 9
                   WHEN 'go' THEN 5 ELSE 12 END,
         CASE lang WHEN 'python' THEN 4 WHEN 'js' THEN 9
                   WHEN 'go' THEN 5 ELSE 12 END + length(sym)
  FROM (SELECT i, repo, path, lang, 0 AS nth, sym0 AS sym FROM rc
        UNION ALL
        SELECT i, repo, path, lang, 1, sym1 FROM rc WHERE i % 2 = 0)
  UNION ALL
  SELECT repo || '/' || path, 'calls', 'api:' || api, repo, path, i,
         5 + (i % 3) + j,
         CASE lang WHEN 'python' THEN 13 WHEN 'js' THEN 17
                   WHEN 'go' THEN 11 ELSE 17 END,
         CASE lang WHEN 'python' THEN 13 WHEN 'js' THEN 17
                   WHEN 'go' THEN 11 ELSE 17 END + length(api)
  FROM (SELECT i, repo, path, lang, j,
               ({libs})[1 + ((i * 7) % 17)] || '.' ||
               ({methods})[1 + ((i + j) % 7)] AS api
        FROM rows, unnest(generate_series(0, i % 2)) AS t(j))
),
picked AS (
  SELECT *, row_number() OVER (
      PARTITION BY subj, pred, obj
      ORDER BY path, unit_id, src_start, src_end) AS rn
  FROM m
)
SELECT p.subj, p.pred, p.obj, p.repo, p.path, s.content_sha,
       p.unit_id::BIGINT AS unit_id, p.src_start::BIGINT AS src_start,
       p.src_end::BIGINT AS src_end
FROM picked p JOIN shas s ON s.i = p.i
WHERE p.rn = 1
ORDER BY p.subj, p.pred, p.obj
"""


def nodes_sql() -> str:
    """Mirror of the canonicalized node table: canonical id + mention count
    (every planted span mention counts once, vendor spans excluded)."""
    libs = _sql_list(LIBS)
    methods = _sql_list(METHODS)
    licenses = _sql_list(LICENSES)
    return f"""
WITH {ROWS_CTE},
mentions AS (
  SELECT 'license:' || ({licenses})[1 + (i % 5)] AS canon_id FROM rows
  UNION ALL
  SELECT 'lib:' || ({libs})[1 + ((i * 7 + j * 13) % 17)]
  FROM (SELECT i, unnest(generate_series(0, i % 3)) AS j FROM rows)
  UNION ALL
  SELECT 'sym:func_' || ((i * 31) % 997) FROM rows
  UNION ALL
  SELECT 'sym:helper_' || ((i * 13) % 997) FROM rows WHERE i % 2 = 0
  UNION ALL
  SELECT 'api:' || ({libs})[1 + ((i * 7) % 17)] || '.' ||
                   ({methods})[1 + ((i + j) % 7)]
  FROM (SELECT i, unnest(generate_series(0, i % 2)) AS j FROM rows)
)
SELECT canon_id, count(*)::BIGINT AS n_mentions
FROM mentions GROUP BY canon_id ORDER BY canon_id
"""
