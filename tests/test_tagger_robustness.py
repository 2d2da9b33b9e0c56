"""Adversarial-input probes for the tagging/linking path: the pipeline
must never crash on degenerate units, and OOV mentions degrade cleanly
(span tagged or not — but never a bogus link)."""

import pyarrow as pa
import pytest

from nerfray import dicts, model


@pytest.fixture(scope="module")
def tagger():
    crf, conf = model.deserialize(model.model_artifact())
    return model.Tagger(crf, conf)


@pytest.mark.parametrize("text", [
    "", " ", "\t", "   \t  ",
    "\x00\x01 garbage �",
    "ところでこのコードは日本語です",
    "x" * 10000,
    "import",  # trigger word with no argument
    "<>()[]{};;;",
])
def test_tagger_never_crashes(tagger, text):
    spans = tagger.tag(text)
    for sp in spans:
        assert 0 <= sp.start <= sp.end <= len(text)


def test_oov_library_tagged_but_unlinked(tagger):
    """'import leftpad': the CRF may tag the span from context features,
    but the linker must not invent a canonical id for it."""
    spans = tagger.tag("import leftpad")
    aliases = dicts.alias_table()
    for sp in spans:
        canon, score = dicts.link("import leftpad"[sp.start:sp.end],
                                  sp.label, aliases)
        if sp.label == "library":
            assert canon is None  # leftpad is not in the alias table


def test_unseen_license_name(tagger):
    spans = tagger.tag("# Licensed under the WTFPL Custom License 9.9")
    aliases = dicts.alias_table()
    for sp in spans:
        if sp.label == "license":
            surface = "# Licensed under the WTFPL Custom License 9.9"[
                sp.start:sp.end]
            canon, _ = dicts.link(surface, "license", aliases)
            assert canon is None or canon.startswith("license:")


def test_pipeline_handles_degenerate_files(ray_session):
    """Whole pipeline over a corpus-shaped table of pathological rows."""
    import ray.data
    from nerfray.pipelines import kg
    rows = {
        "repo": ["r/a"] * 4,
        "path": ["p0", "p1", "p2", "p3"],
        "commit": ["c"] * 4,
        "lang": ["python"] * 4,
        "content": ["", "\n\n\n", "\x00�\n日本語",
                    "import os\n" + "junk " * 2000],
    }
    ds = ray.data.from_arrow(pa.Table.from_pydict(rows))
    trips = kg.kg_pipeline(ds, tagger="crf").take_all()
    got = {(r["subj"], r["pred"], r["obj"]) for r in trips}
    assert ("r/a", "imports", "lib:os") in got


def test_midrun_actor_death_is_transparent(ray_session, tmp_path):
    """A tagging actor dying mid-run (hard process exit, not a Python
    exception) must be retried by Ray transparently and leave the
    triple set exactly equal to a clean run — the retry-idempotency the
    checkpoint/lineage story assumes of every stage. The chaos actor
    lives in the library (stages/chaos.py) because workers must import
    actor classes by module path; see its docstring."""
    import os

    from nerfray.pipelines import kg
    from nerfray.sources import corpus_source
    from nerfray.stages.chaos import KillOnceTagUnits

    n = 200
    clean = kg.kg_pipeline(corpus_source.corpus_dataset_by_repo(n),
                           tagger="crf", dedup="partitioned")
    want = {(r["subj"], r["pred"], r["obj"]) for r in clean.take_all()}

    marker = str(tmp_path / "chaos_fired")
    units = kg.units_of(corpus_source.corpus_dataset_by_repo(n))
    spans = kg.spans_of(units, tagger=KillOnceTagUnits,
                        tagger_kwargs={"marker": marker})
    trips = kg.triples_of(kg.linked_of(spans), dedup="partitioned")
    got = {(r["subj"], r["pred"], r["obj"]) for r in trips.take_all()}
    assert os.path.exists(marker), "chaos hook never fired"
    assert got == want
