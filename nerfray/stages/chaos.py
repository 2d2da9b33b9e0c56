"""Fault-injection tagging actors for resilience testing.

A distributed pipeline's correctness story includes "a worker dying
mid-run changes nothing": Ray restarts dead actors and re-executes
their in-flight tasks, and every stage in this repo is a pure function
of its input block, so retries are idempotent by construction. These
wrappers make that property TESTABLE by simulating real crashes
(hard ``os._exit``, not Python exceptions) exactly once per marker
file — single-node scope, which is what the sandbox can exercise.

They live in the library (not in tests/) because Ray workers must be
able to import an actor class by module path when (re)constructing it;
a class defined inside a pytest module is invisible to fresh worker
processes, so its actor restarts would fail forever and the pipeline
would hang — the trap is documented in SCALE.md.
"""

from __future__ import annotations

import os

import pyarrow as pa

from . import tagging


class KillOnceTagUnits:
    """TagUnits that hard-kills its worker process on the first batch
    any instance sees (a marker file on the node's shared disk ensures
    exactly one simulated crash), then behaves identically to
    TagUnits. Result equality with a clean run evidences transparent
    actor restart + task retry."""

    def __init__(self, model_ref, marker: str):
        self._inner = tagging.TagUnits(model_ref)
        self._marker = marker

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not os.path.exists(self._marker):
            open(self._marker, "w").close()
            os._exit(1)  # simulated hard crash: no cleanup, no raise
        return self._inner(batch)
