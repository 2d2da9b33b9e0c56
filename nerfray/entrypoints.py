"""Registry of the training-data-pipeline operators (dedup, similarity,
text analysis, multimodal) exposed through ``__ray_entry__.queries()``.

Each entry is a callable ``sf_dir -> Dataset/Table``; SQL-expressible ones
also appear in ``ops_oracles()`` with a DuckDB mirror over the registered
views (documents / embeddings).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def ops_queries() -> dict[str, Callable[[str], Any]]:
    from nerfray.ops import registry
    return registry.queries()


def ops_oracles() -> dict[str, str]:
    from nerfray.ops import registry
    return registry.oracles()
