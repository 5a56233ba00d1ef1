from .qmodule import (
    QModuleMixin,
    QScale,
    quantize_module,
    quantized_module_classes,
    register_qmodule,
)
from .qlinear import QLinear
from .qconv2d import QConv2d
from .qlayernorm import QLayerNorm
