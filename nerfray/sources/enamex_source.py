"""ENAMEX corpus as a Ray Data source/sink (SURVEY.md §2.1 S1/S2).

The reference reads one ENAMEX sentence per line (``readDeep``,
/root/reference/src/NLP/Nerf.hs:60-61) and renders forests back to lines
(``showForest``, app/Main.hs:280). Here:

- ``read_enamex``: ``ray.data.read_text`` -> per-batch parse into
  (unit_id, text, spans) rows — spans as a nested list<struct> column
  (FIXTURES.md F2 tabular twin).
- ``write_enamex``: span rows -> rendered lines -> ``write_text``-style
  parquet/text output.

The gold training fixture for the KG corpus is written/read through this
path, mirroring the reference's train flow (gold ENAMEX -> re-tokenize ->
IOB encode).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..core import enamex
from ..core.iob import Span

SPAN_T = pa.struct([("label", pa.string()), ("start", pa.int32()),
                    ("end", pa.int32()), ("depth", pa.int32())])

ENAMEX_SCHEMA = pa.schema([
    ("unit_id", pa.int64()),
    ("words", pa.list_(pa.string())),
    ("spans", pa.list_(SPAN_T)),
])


def _parse_batch(batch: pa.Table) -> pa.Table:
    words_col, spans_col, ids = [], [], []
    texts = batch.column("text").to_pylist()
    base = batch.column("_base_id").to_pylist() \
        if "_base_id" in batch.column_names else range(len(texts))
    for uid, line in zip(base, texts):
        ws, sps = enamex.parse(line)
        ids.append(uid)
        words_col.append(ws)
        spans_col.append([{"label": s.label, "start": s.start,
                           "end": s.end, "depth": s.depth} for s in sps])
    return pa.Table.from_pydict({
        "unit_id": pa.array(ids, pa.int64()),
        "words": pa.array(words_col, pa.list_(pa.string())),
        "spans": pa.array(spans_col, pa.list_(SPAN_T)),
    }, schema=ENAMEX_SCHEMA)


def read_enamex(path: str) -> ray.data.Dataset:
    """ENAMEX text file(s) -> Dataset of (unit_id, words, spans)."""
    ds = ray.data.read_text(path)
    return ds.map_batches(_parse_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


def _render_batch(batch: pa.Table) -> pa.Table:
    out = []
    for ws, sps in zip(batch.column("words").to_pylist(),
                       batch.column("spans").to_pylist()):
        spans = [Span(d["label"], d["start"], d["end"], d["depth"])
                 for d in sps]
        out.append(enamex.render(ws, spans))
    return pa.Table.from_pydict({"text": pa.array(out, pa.string())})


def render_enamex(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(words, spans) rows -> rendered ENAMEX lines."""
    return ds.map_batches(_render_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


def write_gold_fixture(path: str, n_train: int) -> int:
    """Materialize the synthetic gold training units as an ENAMEX file
    (token-grain spans via the kernel's tokenizer alignment); returns the
    line count. Driver-side: the fixture is small (reference's own
    train.nes is 1k lines)."""
    from .. import model as model_mod
    from ..core.tokenize import tokenize
    lines = []
    for text, gspans in model_mod.training_corpus(n_train):
        toks = tokenize(text)
        tspans = model_mod.char_spans_to_token_spans(toks, gspans)
        lines.append(enamex.render([t.text for t in toks], tspans))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return len(lines)
