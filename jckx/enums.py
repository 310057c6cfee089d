"""Model registry enum.

Capability parity with reference ``enums.py:4-9`` (string-valued enum of the
trainable model families, used for CLI dispatch).
"""

from enum import Enum


class ModelEnum(Enum):
    DCGAN = "DCGAN"
    CGAN = "CGAN"

    def __str__(self) -> str:
        return self.value
