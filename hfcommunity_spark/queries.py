"""Aggregates the declared-query registry.

Importing this module imports every operator module so its ``@query``
registrations land in ``REGISTRY``.  The driver contract
(``__spark_entry__.py``) and the tests both consume this.
"""

from __future__ import annotations

from hfcommunity_spark.registry import REGISTRY, QuerySpec

# Import for registration side effects — order defines display order.
from hfcommunity_spark.operators import relational  # noqa: F401
from hfcommunity_spark.operators import relational_ext  # noqa: F401
from hfcommunity_spark.operators import relational_ext2  # noqa: F401

try:  # modules added incrementally; keep the registry importable
    from hfcommunity_spark.operators import mergeops  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from hfcommunity_spark.operators import textops  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from hfcommunity_spark.operators import dedup  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from hfcommunity_spark.operators import similarity  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from hfcommunity_spark.operators import multimodal  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from hfcommunity_spark.operators import pandas_udfs  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from hfcommunity_spark.operators import skew  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from hfcommunity_spark.streaming import batch_parity  # noqa: F401
except ImportError:  # pragma: no cover
    pass


def all_queries() -> dict[str, QuerySpec]:
    return dict(REGISTRY)
