from iif_tpu.native.rle_native import (  # noqa: F401
    native_available,
    rle_encode_native,
    rle_decode_native,
    rle_iou_native,
)
