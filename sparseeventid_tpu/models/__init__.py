from .blocks import (  # noqa: F401
    ConvolutionDownsample,
    ConvolutionUpsample,
    InputNorm,
    MaskedBatchNorm,
    MaskedGroupNorm,
    PoolingDownsample,
    SparseBlock,
    SparseBlockSeries,
    SparseResidualBlock,
)
from .encoder import Encoder, capacity_schedule, encoder_output_shape  # noqa: F401
from .heads import DenseChainHead, MultiHeadOutput, pool_encoded  # noqa: F401
from .build import SparseEventClassifier, build_sparse_classifier  # noqa: F401
