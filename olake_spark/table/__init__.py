from olake_spark.table.format import DataFileEntry, Snapshot, TableMetadata  # noqa: F401
from olake_spark.table.table import CommitConflict, Table  # noqa: F401
