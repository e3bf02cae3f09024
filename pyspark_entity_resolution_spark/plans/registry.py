"""Aggregated driver-contract query registry."""

from __future__ import annotations

from .common import QuerySpec
from . import queries_relational

_MODULES = [queries_relational]

try:  # optional modules appear as they are built
    from . import queries_er

    _MODULES.append(queries_er)
except ImportError:
    pass
try:
    from . import queries_text

    _MODULES.append(queries_text)
except ImportError:
    pass
try:
    from . import queries_vector

    _MODULES.append(queries_vector)
except ImportError:
    pass
try:
    from . import queries_events

    _MODULES.append(queries_events)
except ImportError:
    pass


def all_queries() -> dict[str, QuerySpec]:
    out: dict[str, QuerySpec] = {}
    for mod in _MODULES:
        for name, spec in mod.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name: {name}")
            out[name] = spec
    return out
