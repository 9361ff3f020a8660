"""Host-side visualization panels (reference ``utils.py:92-117``).

Row of images/masks with titles; masks rendered through the dataset
palette.  Returns the matplotlib figure (callers save or log it).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from pistoseg_tpu.ops.palette import mask_to_rgb


def visualize_panel(palette: Sequence[int], **images):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(images)
    fig, axes = plt.subplots(nrows=1, ncols=max(n, 1), figsize=(4 * n, 4))
    if n == 1:
        axes = [axes]
    for ax, (name, image) in zip(axes, images.items()):
        arr = np.asarray(image)
        if "mask" in name and arr.ndim == 2:
            arr = mask_to_rgb(arr.astype(np.uint8), palette)
        ax.imshow(arr.astype(np.uint8) if arr.dtype != np.uint8 else arr)
        ax.set_title(name, fontsize=12)
        ax.set_xticks([])
        ax.set_yticks([])
    fig.tight_layout()
    return fig


def panel_to_array(fig) -> np.ndarray:
    """Rasterize a panel figure to (H, W, 3) uint8 (for TB image logging)."""
    fig.canvas.draw()
    arr = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    import matplotlib.pyplot as plt

    plt.close(fig)
    return arr


def validation_panel(palette, image, gt_mask, pred_mask) -> np.ndarray:
    """The reference's per-epoch TB panel (``mosaic_module.py:271-277``):
    input image, ground-truth mask, prediction — as one uint8 array."""
    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = np.clip(img * 255.0 if img.max() <= 1.5 else img, 0, 255).astype(np.uint8)
    fig = visualize_panel(palette, image=img, gt_mask=gt_mask, pred_mask=pred_mask)
    return panel_to_array(fig)
