"""Ontology / constraint validation over the emitted triple stream —
the KG-quality gate a production pipeline runs before publishing a
graph (cf. SHACL-style shape checking, here as a streaming map-side
operator: the spec is a tiny constant broadcast into every task, no
shuffle touches the triples until the final per-(pred, status) rollup).

Checks, in priority order (a triple reports its FIRST failure):
  unknown_pred    — pred outside the ontology
  bad_obj_prefix  — obj not in the pred's required namespace
  bad_subj_grain  — repo-grain pred with file-grain subject or vice
                    versa (repo = 'org/name', file = 'org/name/path')
  license_denied  — licensed-under obj outside the license allowlist
  ok

The synthetic corpus plants real violations for the policy check (two
of its five licenses are outside the allowlist), so the operator's
violation path is exercised by data, not just unit fixtures.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# pred -> (required obj namespace, subject is repo-grain?)
ONTOLOGY: dict[str, tuple[str, bool]] = {
    "licensed-under": ("license:", True),
    "imports": ("lib:", True),
    "defines": ("sym:", False),
    "calls": ("api:", False),
}

# permissive-only license policy: the copyleft tail is flagged
LICENSE_ALLOW = ("MIT", "Apache-2.0", "BSD-3-Clause")

_STATUS = ("ok", "unknown_pred", "bad_obj_prefix", "bad_subj_grain",
           "license_denied")


def check_batch(batch: pa.Table) -> pa.Table:
    """(subj, pred, obj) -> + status column, fully vectorized: one
    boolean kernel per ontology rule (the ontology is O(1) constants,
    so the per-pred loop is over the SPEC, not the data)."""
    subj, pred, obj = (batch.column("subj"), batch.column("pred"),
                       batch.column("obj"))
    n = batch.num_rows
    preds = pa.array(list(ONTOLOGY), pa.string())
    known = pc.is_in(pred, value_set=preds)

    false = pa.array([False] * n, pa.bool_())
    good_prefix, repo_grain = false, false
    for p, (prefix, is_repo) in ONTOLOGY.items():
        is_p = pc.equal(pred, p)
        good_prefix = pc.or_(good_prefix,
                             pc.and_(is_p, pc.starts_with(obj, prefix)))
        if is_repo:
            repo_grain = pc.or_(repo_grain, is_p)
    slashes = pc.count_substring(subj, "/")
    good_grain = pc.if_else(repo_grain, pc.equal(slashes, 1),
                            pc.greater_equal(slashes, 2))
    allowed = pa.array(["license:" + l for l in LICENSE_ALLOW], pa.string())
    lic_denied = pc.and_(pc.equal(pred, "licensed-under"),
                         pc.invert(pc.is_in(obj, value_set=allowed)))

    status = pc.if_else(
        pc.invert(known), "unknown_pred",
        pc.if_else(pc.invert(good_prefix), "bad_obj_prefix",
                   pc.if_else(pc.invert(good_grain), "bad_subj_grain",
                              pc.if_else(lic_denied, "license_denied",
                                         "ok"))))
    return batch.append_column("status", pc.cast(status, pa.string()))


def constraint_counts(triples: ray.data.Dataset) -> ray.data.Dataset:
    """Per-(pred, status) triple counts — the validation dashboard row
    set. Map-side check, one tiny groupby."""
    return triples.map_batches(check_batch, batch_format="pyarrow",
                               zero_copy_batch=True) \
        .groupby(["pred", "status"]).count() \
        .rename_columns({"count()": "n_triples"})


def license_violations(triples: ray.data.Dataset) -> ray.data.Dataset:
    """The violating triples themselves (policy check only): which repos
    carry a denied license. Map-side filter — violations are assumed
    rare, so this is the cheap 'emit the evidence' companion to the
    counts rollup."""
    checked = triples.map_batches(check_batch, batch_format="pyarrow",
                                  zero_copy_batch=True)
    return checked.filter(
        expr="status == 'license_denied'").select_columns(["subj", "obj"])


def _status_case_sql() -> str:
    prefix_ok = " OR ".join(
        f"(pred = '{p}' AND obj LIKE '{prefix}%')"
        for p, (prefix, _) in ONTOLOGY.items())
    repo_preds = ", ".join(f"'{p}'" for p, (_, r) in ONTOLOGY.items() if r)
    known = ", ".join(f"'{p}'" for p in ONTOLOGY)
    allowed = ", ".join(f"'license:{l}'" for l in LICENSE_ALLOW)
    return f"""
    CASE WHEN pred NOT IN ({known}) THEN 'unknown_pred'
         WHEN NOT ({prefix_ok}) THEN 'bad_obj_prefix'
         WHEN NOT (CASE WHEN pred IN ({repo_preds})
                        THEN length(subj) - length(replace(subj, '/', '')) = 1
                        ELSE length(subj) - length(replace(subj, '/', '')) >= 2
                   END) THEN 'bad_subj_grain'
         WHEN pred = 'licensed-under' AND obj NOT IN ({allowed})
           THEN 'license_denied'
         ELSE 'ok' END"""


def constraints_sql(gold_sql: str) -> str:
    """DuckDB mirror of constraint_counts over the gold triple set."""
    return f"""
WITH gold AS ({gold_sql})
SELECT pred, {_status_case_sql()} AS status, count(*)::BIGINT AS n_triples
FROM gold GROUP BY 1, 2 ORDER BY 1, 2
"""


def license_violations_sql(gold_sql: str) -> str:
    allowed = ", ".join(f"'license:{l}'" for l in LICENSE_ALLOW)
    return f"""
WITH gold AS ({gold_sql})
SELECT subj, obj FROM gold
WHERE pred = 'licensed-under' AND obj NOT IN ({allowed})
ORDER BY subj, obj
"""
