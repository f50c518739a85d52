from zebrapose_tpu.codec.surface_code import (
    rgb_to_class_id,
    class_id_to_rgb,
    class_id_to_code,
    code_to_class_id,
)
from zebrapose_tpu.codec.lut import (
    CorrespondenceLUT,
    load_correspondence_lut,
    reduce_lut_ignore_bits,
    save_correspondence_lut,
)

__all__ = [
    "rgb_to_class_id",
    "class_id_to_rgb",
    "class_id_to_code",
    "code_to_class_id",
    "CorrespondenceLUT",
    "load_correspondence_lut",
    "reduce_lut_ignore_bits",
    "save_correspondence_lut",
]
