from jckx.checkpoint.checkpoint import (  # noqa: F401
    save_checkpoint,
    restore_checkpoint,
    flush_writes,
    BestMetricCheckpointer,
    DeviceSnapshot,
    latest_checkpoint,
)
