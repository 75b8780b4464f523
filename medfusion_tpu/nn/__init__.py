from medfusion_tpu.nn import functional  # noqa: F401
from medfusion_tpu.nn.blocks import (  # noqa: F401
    BasicBlock,
    BasicDown,
    BasicResBlock,
    BasicUp,
    ConvND,
    Dense,
    DownBlock,
    Norm,
    UnetBasicBlock,
    UnetResBlock,
    UpBlock,
    make_act,
)
from medfusion_tpu.nn.attention import (  # noqa: F401
    Attention,
    BasicTransformerBlock,
    GEGLU,
    LinearTransformer,
    SpatialTransformer,
    compute_attention,
)
