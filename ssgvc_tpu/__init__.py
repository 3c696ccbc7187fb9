"""ssgvc_tpu — TPU-native segmentation-guided neural video compression.

A from-scratch JAX/XLA/Pallas rebuild of the DCVC-RT-style conditional video
codec with semantic-segmentation-guided rate allocation (reference:
Hrshed/Semantic-Segmentation-Guided-Neural-Video-Compression).

Layout:
    layers/    NN building blocks (DepthConvBlock, WSiLU, subpel conv, quantizers)
    models/    codec models (DMCI intra, DMC inter in 4 variants, entropy estimators)
    ops/       low-level TPU ops (pixel shuffle, pallas kernels)
    coding/    real entropy coding (C++ rANS bindings, bitstream container)
    data/      Waymo TFRecord pipeline + segmentation mask cache
    training/  trainer (GOP lax.scan rollout, 3-optimizer split, RD loss, ALM)
    parallel/  device mesh / sharding utilities
    utils/     metrics, color transforms, checkpoint import, logging
"""

__version__ = "0.1.0"
