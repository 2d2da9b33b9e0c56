"""ENAMEX Ray source/sink, ox stage, and distributed training tests."""

import pytest

from nerfray import corpus, model
from nerfray.core import crf
from nerfray.core.tokenize import tokenize


def test_enamex_roundtrip_via_ray(ray_session, tmp_path):
    from nerfray.sources import enamex_source as es
    path = str(tmp_path / "gold.nes")
    n_lines = es.write_gold_fixture(path, n_train=30)
    assert n_lines > 100

    ds = es.read_enamex(path)
    rows = ds.take_all()
    assert len(rows) == n_lines
    # spans decode to labelled entities
    labels = {d["label"] for r in rows for d in r["spans"]}
    assert {"license", "vendor", "library", "symbol", "api"} <= labels

    # render back: line-set round-trip (order-insensitive)
    rendered = {r["text"] for r in es.render_enamex(ds).take_all()}
    with open(path) as f:
        original = {l for l in f.read().splitlines() if l}
    # only lines with spans render identically to their source; unlabelled
    # lines round-trip too (render of plain words)
    assert rendered == original


def test_ox_stage(ray_session):
    from nerfray.pipelines import kg
    from nerfray.sources import corpus_source
    from nerfray.stages import ox
    units = kg.units_of(corpus_source.corpus_dataset(20))
    rows = ox.ox_of(units).take_all()
    assert all(r["n_obs"] == len(r["obs"]) and r["n_obs"] > 0 for r in rows)
    # every token of every non-empty unit appears exactly once
    toks = {(r["content_sha"], r["unit_id"], r["tok_idx"]) for r in rows}
    assert len(toks) == len(rows)
    expect = sum(len(tokenize(t)) for i in range(20)
                 for t, _ in corpus.row_lines(i, 20))
    assert len(rows) == expect


def test_train_distributed_quality(ray_session):
    """The distributed trainer reaches the same tagging quality as the
    kernel trainer on the synthetic gold corpus (trajectory differs by
    design: larger synchronous minibatches)."""
    from nerfray.stages import train_dist
    conf = model.make_schema_conf()
    sents, labels = [], []
    from nerfray.core import iob, schema
    for text, gspans in model.training_corpus(200):
        toks = tokenize(text)
        tspans = model.char_spans_to_token_spans(toks, gspans)
        stacks = iob.encode(tspans, len(toks))
        sents.append(schema.schematize(conf, [t.text for t in toks]))
        labels.append([iob.stack_to_str(s) for s in stacks])

    m = train_dist.train_distributed(
        sents, labels, crf.SgdArgs(iter_num=6), n_workers=4)
    tagger = model.Tagger(m, conf)
    # tag fresh units from the disjoint eval range: must be perfect
    from nerfray.core.compare import unit_stats, merge
    stats = []
    for i in range(40):
        for text, gspans in corpus.row_lines(i, 40):
            pred = tagger.tag(text)
            stats.append(unit_stats(
                text, [(s.label, s.start, s.end) for s in gspans],
                [(s.label, s.start, s.end) for s in pred]))
    merged = merge(stats)
    for lbl, (tp, fp, fn) in merged.items():
        assert fp == 0 and fn == 0, (lbl, tp, fp, fn)


def test_cross_validate():
    """Reference cv mode analog: every fold of the synthetic gold corpus
    is tagged near-perfectly by a model trained on the others."""
    folds = model.cross_validate(k=2, n_train=80)
    assert len(folds) == 2
    for f in folds:
        assert f["n_eval"] > 0
        assert f["precision"] >= 0.95 and f["recall"] >= 0.95, f


def test_kernel_train_unchanged_by_refactor():
    """encode/batch_gradient/apply_update refactor preserves the exact
    training trajectory (bitwise weight equality on a small fixture)."""
    sents = [[{"a"}, {"b"}], [{"b"}, {"c"}], [{"a"}, {"c"}]]
    labels = [["X", "Y"], ["Y", "X"], ["X", "X"]]
    m1 = crf.train(sents, labels, crf.SgdArgs(iter_num=3, batch_size=2))
    m2 = crf.train(sents, labels, crf.SgdArgs(iter_num=3, batch_size=2))
    import numpy as np
    assert np.array_equal(m1.w_obs, m2.w_obs)
    assert np.array_equal(m1.w_trans, m2.w_trans)
    assert m1.viterbi([{"a"}, {"b"}]) == m2.viterbi([{"a"}, {"b"}])


def test_csv_and_jsonl_sources_round_trip(ray_session, tmp_path):
    """CSV / JSONL readers return the same rows as the parquet source
    (engine-surface beyond the reference's own formats)."""
    import pyarrow.csv as pacsv
    import pyarrow.parquet as pq
    import ray.data
    from nerfray.sources.parquet import read_csv_clean, read_json_clean
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "lang", "n_chars"])
    pacsv.write_csv(t, str(tmp_path / "docs.csv"))
    with open(tmp_path / "docs.jsonl", "w") as f:
        for r in t.to_pylist():
            import json
            f.write(json.dumps(r) + "\n")
    want = sorted(tuple(sorted(r.items())) for r in t.to_pylist())
    for ds in (read_csv_clean(str(tmp_path / "docs.csv")),
               read_json_clean(str(tmp_path / "docs.jsonl"))):
        got = sorted(tuple(sorted(r.items())) for r in ds.take_all())
        assert got == want
