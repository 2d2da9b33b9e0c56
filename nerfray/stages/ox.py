"""``ox`` mode: observation-extraction introspection as a Dataset stage
(the reference's debug CLI mode, /root/reference/app/Main.hs:308-313,
src/NLP/Nerf.hs:66-76; SURVEY.md §5.3).

Emits one row per token with its extracted observation set — lets a human
(or a test) diff feature extraction between engine versions.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from .. import model as model_mod
from ..core import schema as schema_mod
from ..core.tokenize import tokenize

OX_SCHEMA = pa.schema([
    ("content_sha", pa.string()),
    ("unit_id", pa.int32()),
    ("tok_idx", pa.int32()),
    ("tok", pa.string()),
    ("n_obs", pa.int32()),
    ("obs", pa.list_(pa.string())),
])


class OxUnits:
    """Actor: unit rows -> per-token observation rows (schema built once)."""

    def __init__(self, conf: schema_mod.SchemaConf | None = None):
        self.conf = conf or model_mod.make_schema_conf()

    def __call__(self, batch: pa.Table) -> pa.Table:
        shas = batch.column("content_sha").to_pylist()
        uids = batch.column("unit_id").to_pylist()
        cols = {n: [] for n in OX_SCHEMA.names}
        for sha, uid, text in zip(shas, uids,
                                  batch.column("text").to_pylist()):
            toks = tokenize(text)
            if not toks:
                continue
            obs_sets = schema_mod.schematize(self.conf,
                                             [t.text for t in toks])
            for k, (t, obs) in enumerate(zip(toks, obs_sets)):
                cols["content_sha"].append(sha)
                cols["unit_id"].append(uid)
                cols["tok_idx"].append(k)
                cols["tok"].append(t.text)
                cols["n_obs"].append(len(obs))
                cols["obs"].append(sorted(obs))
        return pa.Table.from_pydict(
            {n: pa.array(cols[n], OX_SCHEMA.field(n).type)
             for n in OX_SCHEMA.names}, schema=OX_SCHEMA)


def ox_of(units: ray.data.Dataset, concurrency=(1, 4)) -> ray.data.Dataset:
    return units.map_batches(OxUnits, concurrency=concurrency,
                             batch_size=256, batch_format="pyarrow")
