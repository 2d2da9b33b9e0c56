"""Frozen tagging-regression fixture (FIXTURES.md F4): the CRF stage must
reproduce the frozen span set exactly (order-insensitive on
(content_sha, unit_id, span)). Refreeze intentionally with
`python tools/refreeze.py`."""

import json
import os

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "expected_spans.json")


def test_tagging_matches_frozen_fixture():
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    import refreeze
    with open(FIXTURE) as f:
        frozen = json.load(f)
    current = refreeze.generate()

    def keyed(rows):
        return {(r["content_sha"], r["unit_id"]):
                sorted(map(tuple, r["spans"])) for r in rows}

    a, b = keyed(frozen), keyed(current)
    assert a.keys() == b.keys()
    diffs = {k: (a[k], b[k]) for k in a if a[k] != b[k]}
    assert not diffs, f"{len(diffs)} units changed, e.g. " \
                      f"{next(iter(diffs.items()))}"
