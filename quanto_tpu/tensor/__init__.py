from .activations import ActivationQBytesArray, fake_quantize_activation, quantize_activation
from .grouped import group, grouped_shape, ungroup
from .optimizers import (
    AbsmaxOptimizer,
    AffineOptimizer,
    HqqOptimizer,
    MaxOptimizer,
    Optimizer,
    SymmetricOptimizer,
)
from .packed import PackedArray
from .qarray import QArray, qfallback
from .qtype import *  # noqa: F401,F403
from .qtype import qtype, qtypes
from .weights import (
    WeightQBitsArray,
    WeightQBitsTpuArray,
    WeightQBytesArray,
    fake_quantize_weight,
    quantize_weight,
)
