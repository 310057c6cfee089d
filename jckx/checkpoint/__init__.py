from jckx.checkpoint.checkpoint import (  # noqa: F401
    save_checkpoint,
    restore_checkpoint,
    flush_writes,
    BestMetricCheckpointer,
    DeviceSnapshot,
    latest_checkpoint,
    load_serve_sidecar,
)
from jckx.checkpoint.torch_convert import (  # noqa: F401
    import_torch_gan_checkpoint,
    export_torch_gan_checkpoint,
    infer_gan_config,
)
