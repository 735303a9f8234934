from .codec import decode_image, encode_image, psnr  # noqa: F401
from .phash import phash64, phash64_batch, hamming64 # noqa: F401
from .synth import synth_image_table, image_position  # noqa: F401
