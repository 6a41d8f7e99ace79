"""TPU-native framework for unsupervised moving-object detection via
Contextual Information Separation (CVPR 2019).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the TF1
reference `antonilo/unsupervised_detection`: a frozen PWCNet optical-flow
backbone, an adversarial two-player game between a mask generator and a
flow-inpainting recover network, DAVIS2016/FBMS59/SegTrackV2 data pipelines
with on-device augmentation, multi-shift multi-crop ensemble inference and
flow-propagated + CRF post-processing.

Everything on the compute path is jittable, statically shaped, and designed
for SPMD execution over a `jax.sharding.Mesh` (see `parallel/`).
"""

__version__ = "0.1.0"
