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
