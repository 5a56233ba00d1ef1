from . import config
from .pack import pack_weights, unpack_weights
from .qbytes_mm import qbytes_int_mm, qbytes_mm
from .qlinear import qlinear
from .quantize import (
    dequantize_affine,
    dequantize_symmetric,
    quantize_affine,
    quantize_symmetric,
)
