from pistoseg_tpu.data.labels import (  # noqa: F401
    parse_label,
    parse_label_str,
    format_label,
    slide_id,
    parse_patch_name,
)
