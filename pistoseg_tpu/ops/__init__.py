from pistoseg_tpu.ops.resize import (  # noqa: F401
    resize,
    resize_matrix,
    resize_palette_pil,
)
from pistoseg_tpu.ops.palette import (  # noqa: F401
    encode_palette_png,
    decode_palette_png,
    mask_to_rgb,
)
from pistoseg_tpu.ops.patches import (  # noqa: F401
    cut_patch_boxes,
    multiscale_patch_boxes,
)
from pistoseg_tpu.ops.stitch import stitch_canvas, CanvasStitcher  # noqa: F401
from pistoseg_tpu.ops.tta import d4_forward, D4  # noqa: F401
from pistoseg_tpu.ops.background import extract_background  # noqa: F401
