from .loaders import load_table, load_tables, register_views  # noqa: F401
from .schemas import TABLE_SCHEMAS, LOAN_SCHEMAS  # noqa: F401
from .versioned import (  # noqa: F401
    CommitConflict,
    committed_source_batches,
    latest_version,
    optimize_table,
    read_version,
    rollback,
    stream_versioned_sink,
    table_versions,
    vacuum,
    versioned_write,
)
