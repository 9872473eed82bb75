"""mandheling_tpu — a TPU-native mixed-precision (int8) DNN training
framework with the capabilities of UbiquitousLearning/Mandheling-DSP-Training.

The reference offloads NITI integer-only training (int8 forward AND backward,
int32 accumulation, power-of-two per-tensor scales) from an Android CPU to
the Hexagon DSP over FastRPC. Here the accelerator is a TPU: the whole train
step is one jitted XLA program (the analog of the reference's single prepared
DSP graph per iteration), the int8 GEMMs run on the MXU (XLA or Pallas
kernels), and scaling beyond one chip is data/model parallelism over a
`jax.sharding.Mesh` — the reference is single-device, so the distributed
layer is this rebuild's addition (SURVEY.md sections 2.10, 5.8).
"""

__version__ = "0.1.0"

from . import data, models, nn, ops, parallel, train, utils  # noqa: F401
