"""The reference's REAL corpus as a fixture: example/train.nes — 1,000
annotated Polish sentences with nested entities (22 label types, 942
spans).  The only real-world data in the sandbox, and the hardest
fixture for the ENAMEX lexer (S1/S2/M19), IOB codec (M3/M5), schema
feature extraction (M6-M17), SGD training (A5) and Viterbi decoding
(O2): unicode text, deep nesting (persName.surname.relAdj), escaped
characters, and genuinely noisy label statistics.

Reference: /root/reference/example/train.nes; hyperparams
app/Main.hs:119-123 (iterNum=10, batchSize=30, regVar=10, gain0=1,
tau=5); eval semantics Compare.hs:59-119 (per-type span-set TP/FP/FN).
"""

import sys

import pytest

sys.path.insert(0, "/root/repo")

from nerfray.core import crf, enamex, iob, schema

NES_PATH = "/root/reference/example/train.nes"


@pytest.fixture(scope="module")
def nes_lines():
    with open(NES_PATH, encoding="utf-8") as f:
        return f.read().splitlines()


def test_enamex_roundtrip_all_1000_real_lines(nes_lines):
    """parse ∘ render ≡ id byte-for-byte on every real line — the
    "isomorphic functions" property on the corpus it was written for,
    not just synthetic fixtures."""
    assert len(nes_lines) == 1000
    n_spans = 0
    labels = set()
    for ln in nes_lines:
        words, spans = enamex.parse(ln)
        assert enamex.render(words, spans) == ln
        n_spans += len(spans)
        labels.update(s.label for s in spans)
    # corpus shape pins (any parser regression shifts these)
    assert n_spans == 942
    assert len(labels) == 22
    assert "placeName.country" in labels and "persName.surname" in labels


def test_iob_codec_roundtrip_on_real_nesting(nes_lines):
    """encode -> decode is the identity on every real nested span set
    (depth-aware stacks, incl. 3-level persName.surname.relAdj)."""
    for ln in nes_lines:
        words, spans = enamex.parse(ln)
        stacks = iob.encode(spans, len(words))
        # the string codec round-trips each stack too
        stacks2 = [iob.stack_from_str(iob.stack_to_str(s))
                   for s in stacks]
        assert stacks2 == stacks
        got = sorted(iob.decode(stacks),
                     key=lambda s: (s.start, -s.end, s.depth))
        want = sorted(spans, key=lambda s: (s.start, -s.end, s.depth))
        assert got == want


@pytest.fixture(scope="module")
def nes_model(nes_lines):
    """CRF trained on the first 800 real sentences, reference
    hyperparams + default schema (shared across the eval tests)."""
    parsed = [enamex.parse(ln) for ln in nes_lines]
    conf = schema.default_conf()
    train = parsed[:800]
    sents = [schema.schematize(conf, w) for w, _ in train]
    labels = [[iob.stack_to_str(st) for st in iob.encode(s, len(w))]
              for w, s in train]
    return crf.train(sents, labels, crf.SgdArgs()), conf, parsed


def test_distributed_enamex_roundtrip_real_corpus(ray_session, nes_lines):
    """S1/S2 as Ray Data stages on the real corpus: read_text ->
    distributed parse -> distributed render reproduces every line
    (order-insensitively; Ray blocks don't preserve file order)."""
    from nerfray.sources.enamex_source import read_enamex, render_enamex

    ds = read_enamex(NES_PATH)
    rendered = sorted(
        r["text"] for r in render_enamex(ds).take_all())
    assert rendered == sorted(nes_lines)


def test_actor_pool_tagging_matches_driver_on_real_corpus(
        ray_session, nes_model):
    """ST1 on real data: the broadcast-model actor-pool map_batches
    stage must produce byte-identical spans to driver-side Viterbi on
    the 200 held-out real sentences."""
    import pyarrow as pa
    import ray
    import ray.data

    from nerfray import model as model_mod

    model, conf, parsed = nes_model
    test = parsed[800:]
    texts = [" ".join(w) for w, _ in test]

    # driver-side reference: tag each text with the library Tagger
    tagger = model_mod.Tagger(model, conf)
    want = {t: sorted((s.label, s.start, s.end, s.depth)
                      for s in tagger.tag(t)) for t in texts}

    blob = model_mod.serialize(model, conf)
    model_ref = ray.put(blob)

    class TagNes:
        def __init__(self, ref):
            m, c = model_mod.deserialize(ray.get(ref))
            self.tagger = model_mod.Tagger(m, c)

        def __call__(self, batch: pa.Table) -> pa.Table:
            out_t, out_s = [], []
            for t in batch.column("text").to_pylist():
                out_t.append(t)
                out_s.append([
                    {"label": s.label, "start": s.start,
                     "end": s.end, "depth": s.depth}
                    for s in self.tagger.tag(t)])
            span_t = pa.struct([("label", pa.string()),
                                ("start", pa.int32()),
                                ("end", pa.int32()),
                                ("depth", pa.int32())])
            return pa.Table.from_pydict({
                "text": pa.array(out_t, pa.string()),
                "spans": pa.array(out_s, pa.list_(span_t))})

    ds = ray.data.from_items([{"text": t} for t in texts]) \
        .repartition(4) \
        .map_batches(TagNes, fn_constructor_args=(model_ref,),
                     concurrency=2, batch_size=32,
                     batch_format="pyarrow")
    got = {r["text"]: sorted((d["label"], d["start"], d["end"], d["depth"])
                             for d in r["spans"])
           for r in ds.take_all()}
    assert got == want
    assert sum(len(v) for v in got.values()) > 0  # model does tag things


def test_crf_trains_and_tags_real_corpus(nes_lines):
    """Train on the first 800 real sentences with the REFERENCE
    hyperparams (app/Main.hs:119-123) and the reference default schema
    (Schema.hs:309-322, no NE dictionaries — the sandbox has no Polish
    lexicon data), decode the held-out 200, score per Compare.hs span
    semantics.  Training is fully deterministic (seeded shuffle,
    sorted vocab), so the floors pin the measured run (P=0.299,
    R=0.230) with a small numerical margin.  Without the Polish
    morphological dictionaries the reference ships separately this is
    the expected dictionary-less operating point — the fixture guards
    the whole train->tag->eval path on real data, not SOTA accuracy."""
    parsed = [enamex.parse(ln) for ln in nes_lines]
    train, test = parsed[:800], parsed[800:]
    conf = schema.default_conf()
    sents = [schema.schematize(conf, w) for w, _ in train]
    labels = [[iob.stack_to_str(st) for st in iob.encode(s, len(w))]
              for w, s in train]
    model = crf.train(sents, labels, crf.SgdArgs())  # reference defaults

    tp = fp = fn = 0
    for words, gold in test:
        ys = model.viterbi(schema.schematize(conf, words))
        pred = iob.decode([iob.stack_from_str(y) for y in ys])
        gset = {(s.label, s.start, s.end) for s in gold}
        pset = {(s.label, s.start, s.end) for s in pred}
        tp += len(gset & pset)
        fp += len(pset - gset)
        fn += len(gset - pset)
    assert tp + fn == 126  # held-out gold span count (corpus pin)
    p = tp / (tp + fp)
    r = tp / (tp + fn)
    assert p >= 0.28, (tp, fp, fn)
    assert r >= 0.21, (tp, fp, fn)
