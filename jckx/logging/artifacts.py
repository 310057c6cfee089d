"""Run-dir artifacts: sample grids, labeled class grids, loss curves.

Reference artifacts reproduced (same filenames / layout):
- ``real_image.png``: grid of the first real batch (dcgan_trainer.py:144-148)
- ``<iters>_fake_image.png``: grid of generated samples per checkpoint
  (dcgan_trainer.py:93-97); CGAN variant is a 10×10 class-labeled panel
  (cgan_trainer.py:93-103)
- ``loss.png``: D/G loss curves over iterations (dcgan_trainer.py:228-239)

Grids are assembled in numpy and written with PIL (no GUI backend); the
labeled CGAN panel and the loss plot use matplotlib's Agg backend.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _to_uint8(images: np.ndarray) -> np.ndarray:
    """[-1,1] or [0,1] float NHWC → uint8, min-max normalized per batch
    (torchvision make_grid(normalize=True) semantics)."""
    x = np.asarray(images, np.float32)
    lo, hi = x.min(), x.max()
    x = (x - lo) / max(hi - lo, 1e-8)
    return (x * 255).astype(np.uint8)


def make_grid(images: np.ndarray, ncol: int = 8, padding: int = 2) -> np.ndarray:
    """NHWC uint8/float → single HWC uint8 grid image."""
    imgs = _to_uint8(images)
    n, h, w, c = imgs.shape
    ncol = min(ncol, n)
    nrow = (n + ncol - 1) // ncol
    grid = np.zeros(
        (nrow * (h + padding) + padding, ncol * (w + padding) + padding, c), np.uint8
    )
    for i in range(n):
        r, col = divmod(i, ncol)
        y0 = r * (h + padding) + padding
        x0 = col * (w + padding) + padding
        grid[y0 : y0 + h, x0 : x0 + w] = imgs[i]
    return grid


def save_image_grid(path: str, images, ncol: int = 8, padding: int = 2) -> None:
    from PIL import Image

    grid = make_grid(np.asarray(images), ncol=ncol, padding=padding)
    if grid.shape[-1] == 1:
        grid = grid[..., 0]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(grid).save(path)


def save_labeled_grid(path: str, images, labels: Sequence[str], ncol: int = 10) -> None:
    """CGAN per-class panel (cgan_trainer.py:93-103): one titled cell per
    class, ``ncol``×``ncol`` figure."""
    imgs = _to_uint8(np.asarray(images))
    n = min(len(imgs), ncol * ncol)
    fig = plt.figure(figsize=(10, 10))
    for i in range(n):
        ax = fig.add_subplot(ncol, ncol, i + 1)
        ax.set_title(str(labels[i]), fontsize=6)
        ax.axis("off")
        im = imgs[i]
        ax.imshow(im[..., 0] if im.shape[-1] == 1 else im, cmap="gray" if im.shape[-1] == 1 else None)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path)
    plt.close(fig)


def save_loss_curve(path: str, losses_d, losses_g) -> None:
    fig = plt.figure(figsize=(8, 6))
    xs = range(1, len(losses_g) + 1)
    plt.plot(xs, losses_d, label="Discriminator Loss")
    plt.plot(xs, losses_g, label="Generator Loss")
    plt.title("Discriminator and Generator Loss")
    plt.xlabel("Iterations")
    plt.ylabel("Loss")
    plt.legend()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path)
    plt.close(fig)
