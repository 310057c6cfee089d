from jckx.kernels.fused_bn_act import bn_act  # noqa: F401
