from gaussianavatar_tpu.models.layers import (
    Conv2DBlock,
    UpConv2DBlock,
    GeomConvLayers,
    GeomConvBottleneckLayers,
    UnetNoCond5DS,
    UnetNoCond6DS,
    UnetNoCond7DS,
)
from gaussianavatar_tpu.models.decoder import ShapeDecoder
from gaussianavatar_tpu.models.pop import POPDecoder
