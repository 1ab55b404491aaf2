"""Query registry: every operator exposed through __spark_entry__.

Importing this package registers all query modules.
"""

from . import cdc_queries  # noqa: F401
from . import relational_queries  # noqa: F401
from . import northstar_queries  # noqa: F401
from . import scalar_queries  # noqa: F401
from . import streaming_queries  # noqa: F401
from . import advanced_queries  # noqa: F401
from . import tpch_extra_queries  # noqa: F401
from . import training_queries  # noqa: F401
from . import curation_queries  # noqa: F401
from .registry import REGISTRY, QuerySpec, oracle_sql_map, queries_map

__all__ = ["REGISTRY", "QuerySpec", "queries_map", "oracle_sql_map"]
