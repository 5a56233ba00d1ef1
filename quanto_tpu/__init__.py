"""quanto-tpu: a TPU-native (JAX/XLA/Pallas) quantization framework.

From-scratch re-design of the capabilities of huggingface/optimum-quanto for
TPU: QArray pytrees instead of tensor subclasses, explicit quantized ops
instead of dispatch interception, Pallas fused dequant-matmul kernels instead
of CUDA extensions, and jax.sharding for multi-chip scale-out (which the
reference does not have).
"""

__version__ = "0.1.0"

from .tensor import *  # noqa: F401,F403
from .ops import qlinear  # noqa: F401
from .nn import (  # noqa: F401
    QConv2d,
    QLayerNorm,
    QLinear,
    QModuleMixin,
    QScale,
    quantize_module,
    register_qmodule,
)
from .quantize import (  # noqa: F401
    freeze,
    get_module_by_name,
    named_qmodules,
    quantization_map,
    quantize,
    requantize,
    set_module_by_name,
)
from .calibrate import Calibration, absmax_scale, calibrate_jit  # noqa: F401
from . import serialization  # noqa: F401
from .serialization import load_state_dict, state_dict  # noqa: F401
