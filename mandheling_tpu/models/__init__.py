from .lenet import LeNetFP32, lenet_niti, NUM_CLASSES, NITI_LOGIT_CHANNELS

__all__ = ["LeNetFP32", "lenet_niti", "NUM_CLASSES", "NITI_LOGIT_CHANNELS"]
