"""Abstract trainer (reference ``train/trainer.py:4-7``)."""

from abc import ABC, abstractmethod


class Trainer(ABC):
    @abstractmethod
    def train(self):
        ...
