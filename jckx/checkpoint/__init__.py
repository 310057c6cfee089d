from jckx.checkpoint.checkpoint import (  # noqa: F401
    save_checkpoint,
    restore_checkpoint,
    BestMetricCheckpointer,
    latest_checkpoint,
)
