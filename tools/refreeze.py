"""Regenerate the frozen tagging-regression fixture (FIXTURES.md F4).

Usage: python tools/refreeze.py

Writes tests/fixtures/expected_spans.json: the kernel tagger's output
over the first FIXTURE_N corpus rows. pytest diffs against it exactly —
run this ONLY when a model/feature/corpus change intentionally alters
tagging output (and bump MODEL_VERSION/CORPUS_VERSION accordingly).
"""

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_N = 60
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "expected_spans.json")


def generate() -> list[dict]:
    from nerfray import corpus, model
    crf, conf = model.deserialize(model.model_artifact())
    tagger = model.Tagger(crf, conf)
    rows = []
    for i in range(FIXTURE_N):
        content = corpus.row_content(i, FIXTURE_N)
        sha = hashlib.sha256(content.encode()).hexdigest()
        for uid, line in enumerate(content.split("\n")):
            spans = [[s.label, s.start, s.end, s.depth]
                     for s in tagger.tag(line)]
            rows.append({"content_sha": sha, "unit_id": uid,
                         "spans": spans})
    return rows


if __name__ == "__main__":
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    rows = generate()
    with open(OUT, "w") as f:
        json.dump(rows, f, indent=0, sort_keys=True)
    n_spans = sum(len(r["spans"]) for r in rows)
    print(f"froze {len(rows)} units / {n_spans} spans -> {OUT}")
