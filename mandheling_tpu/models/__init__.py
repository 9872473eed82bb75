from .lenet import LeNetFP32, lenet_niti, NUM_CLASSES, NITI_LOGIT_CHANNELS
from .mobilenet import mobilenet_v1_niti, mobilenet_v2_niti
from .mobilenet_fp32 import MobileNetV1FP32, MobileNetV2FP32
from .resnet import resnet18_niti, resnet50v2_niti
from .squeezenet import squeezenet_niti
from .inception import inceptionv3_niti

__all__ = [
    "resnet50v2_niti",
    "squeezenet_niti",
    "inceptionv3_niti",
    "LeNetFP32",
    "lenet_niti",
    "NUM_CLASSES",
    "NITI_LOGIT_CHANNELS",
    "mobilenet_v1_niti",
    "mobilenet_v2_niti",
    "MobileNetV1FP32",
    "MobileNetV2FP32",
    "resnet18_niti",
]
