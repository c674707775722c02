from .loaders import load_table, load_tables, register_views  # noqa: F401
from .schemas import TABLE_SCHEMAS, LOAN_SCHEMAS  # noqa: F401
from .versioned import (  # noqa: F401
    CommitConflict,
    SchemaMismatch,
    VersionVacuumedError,
    clone_table,
    committed_source_batches,
    delete_where,
    latest_version,
    merge_into,
    optimize_table,
    read_changes,
    read_version,
    rollback,
    snapshot_deletes,
    snapshot_files,
    stream_versioned_merge_sink,
    stream_versioned_sink,
    table_versions,
    vacuum,
    versioned_write,
)
