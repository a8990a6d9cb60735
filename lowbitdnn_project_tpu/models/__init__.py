"""Model zoo: ResNet-18/34/50, MobileNet-V2, MNIST int8 CNN + converters."""

from lowbitdnn_project_tpu.models.layers import (
    QConvParams,
    QLinearParams,
    conv_block,
    fold_bn,
    linear_block,
    quantize_conv,
    quantize_linear,
)
from lowbitdnn_project_tpu.models import mnist, mobilenet, resnet
from lowbitdnn_project_tpu.models.convert import resnet_from_torch_state_dict

__all__ = [
    "QConvParams",
    "QLinearParams",
    "conv_block",
    "linear_block",
    "fold_bn",
    "quantize_conv",
    "quantize_linear",
    "resnet",
    "mobilenet",
    "mnist",
    "resnet_from_torch_state_dict",
]
