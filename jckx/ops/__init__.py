from jckx.ops.conv import conv2d, conv_transpose2d  # noqa: F401
from jckx.ops.norm import batch_norm  # noqa: F401
from jckx.ops.init import conv_init, bn_scale_init, linear_init  # noqa: F401
from jckx.ops.losses import (  # noqa: F401
    bce_from_logits,
    instance_noise_blend,
    gradient_penalty,
)
