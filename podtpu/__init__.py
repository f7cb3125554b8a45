"""podtpu — TPU-native particle object detection framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``microfossil/particle-object-detection`` (the ``miso`` package): CVAT-driven
object-detection training (Faster R-CNN ResNet-50-FPN), adaptive-LR
early-stopping, COCO evaluation, batch auto-annotation inference (including
tiled sliding-window scan inference with cross-tile NMS), and object cropping —
designed TPU-first: static shapes end to end, bf16 MXU matmuls, `jit`-compiled
train/infer steps, `shard_map` data parallelism over a `jax.sharding.Mesh`,
and Pallas kernels for NMS/RoIAlign.
"""

__version__ = "0.1.0"
