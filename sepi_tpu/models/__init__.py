from .tdnn import TdnnSpec, TdnnStack, StatsPooling, Stream
from .xvector import XVectorConfig, XVector, V2_XVECTOR
from .nnet2 import Nnet2Config, Nnet2Multisplice, NNET2_MULTISPLICE, PnormLayer
from .cvector import (
    AmConfig,
    AmNet,
    AM_BOTTLENECK,
    MultitaskConfig,
    MultitaskCVector,
    V3_MULTITASK,
    AdaptedConfig,
    AdaptedXVector,
    V4_ADAPTED,
    CombinedConfig,
    CombinedCVector,
    V5_COMBINED,
)

__all__ = [
    "TdnnSpec",
    "TdnnStack",
    "StatsPooling",
    "Stream",
    "XVectorConfig",
    "XVector",
    "V2_XVECTOR",
    "AmConfig",
    "AmNet",
    "AM_BOTTLENECK",
    "MultitaskConfig",
    "MultitaskCVector",
    "V3_MULTITASK",
    "AdaptedConfig",
    "AdaptedXVector",
    "V4_ADAPTED",
    "CombinedConfig",
    "CombinedCVector",
    "V5_COMBINED",
    "Nnet2Config",
    "Nnet2Multisplice",
    "NNET2_MULTISPLICE",
    "PnormLayer",
]
