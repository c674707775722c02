from .loaders import load_table, load_tables, register_views  # noqa: F401
from .schemas import TABLE_SCHEMAS, LOAN_SCHEMAS  # noqa: F401
from .versioned import (  # noqa: F401
    CommitConflict,
    VersionVacuumedError,
    committed_source_batches,
    latest_version,
    merge_into,
    optimize_table,
    read_version,
    rollback,
    snapshot_files,
    stream_versioned_sink,
    table_versions,
    vacuum,
    versioned_write,
)
