from .registry import QUERIES, QuerySpec, query  # noqa: F401
from . import relational  # noqa: F401  (registers queries on import)
from . import llm_data  # noqa: F401  (registers queries on import)
from . import analytics  # noqa: F401  (registers queries on import)
from . import pipelines  # noqa: F401  (registers queries on import)
from . import sequences  # noqa: F401  (registers queries on import)
from . import lakehouse  # noqa: F401  (registers queries on import)
