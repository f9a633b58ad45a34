"""Driver-contract query registry (package form).

One module per operator family; every module registers its queries into
the shared ``QUERIES`` / ``ORACLES`` dicts in ``_base`` at import time.
Import order matters only for oracle composition (a composed oracle
f-string embeds already-registered component oracles): dedup and text
register before pipeline, similarity's components register before its
recall query (same module, earlier lines).
"""

from timeseriesfuser_spark.contract import _base
from timeseriesfuser_spark.contract import (  # noqa: F401  (registration order)
    core,
    relational,
    dedup,
    text,
    similarity,
    timeseries,
    behavior,
    media,
    pipeline,
    graph,
    sketches,
    tpcds,
)

import sys as _sys

_pkg = _sys.modules[__name__]
# Re-export every top-level name (helpers, constants, query fns) so
# ``contract.<name>`` keeps working exactly as it did for the single
# module — tests and tooling reference private helpers like _events/_ff.
for _m in (_base, core, relational, dedup, text, similarity, timeseries,
           behavior, media, pipeline, graph, sketches, tpcds):
    for _k, _v in vars(_m).items():
        if _k.startswith("__") or hasattr(_pkg, _k):
            continue
        setattr(_pkg, _k, _v)
del _sys, _pkg, _m, _k, _v
