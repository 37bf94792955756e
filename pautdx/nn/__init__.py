"""Reusable flax building blocks for pautdx models."""

from pautdx.nn.attention import (  # noqa: F401
    AttentionPool, LocalAttention, RelativePositionEncoding,
    SinusoidalPositionEncoding, TinyMHA,
)
from pautdx.nn.blocks import (  # noqa: F401
    BackgroundExtractor, ConvBlock1D, ConvStack1D, DepthwiseConv1D,
    DilatedBranches1D, MLP, MultiScaleConv1D, Norm1D, ResidualBlock1D,
    RMSNorm, SqueezeExcite1D, adaptive_avg_pool1d,
)
from pautdx.nn.recurrent import (  # noqa: F401
    BiGRU, BiLSTM, ContextAggregator, QueryAttentionAggregator,
)
from pautdx.nn.transformer import (  # noqa: F401
    CrossShiftEncoderLayer, Encoder, EncoderLayer, HybridEncoderLayer,
)
