from transferia_spark.cdc.changeitem import (  # noqa: F401
    BEFORE_COL,
    COMMIT_TS_COL,
    COUNTER_COL,
    LSN_COL,
    META_COLS,
    OP_COL,
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE,
    as_inserts,
    payload_columns,
)
from transferia_spark.cdc.collapse import collapse, normalize_pk_changes  # noqa: F401
from transferia_spark.cdc.envelopes import (  # noqa: F401
    mongo_change_stream_to_changeitems,
    mysql_binlog_to_changeitems,
    mysql_lsn,
)
from transferia_spark.cdc.merge import (  # noqa: F401
    apply_changelog,
    merge_batch,
    snapshot_plus_changelog,
)
