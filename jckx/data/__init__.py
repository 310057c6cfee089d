from jckx.data.pipeline import (  # noqa: F401
    DCGANDataPreprocessor,
    CGANDataPreprocessor,
    DeviceDataLoader,
    decode_batch,
)
from jckx.data.datasets import load_dataset, CIFAR100_CLASSES, superclass_of  # noqa: F401
