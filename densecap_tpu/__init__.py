"""densecap_tpu: a TPU-native dense-captioning framework.

A from-scratch JAX/XLA/Pallas re-design of the DenseCap system
(CVPR'16 "DenseCap: Fully Convolutional Localization Networks for Dense
Captioning"; reference implementation jcjohnson/densecap, Lua/Torch7).

This is NOT a port: the reference's dynamic-shape, single-image,
single-GPU nn.Module graph is rebuilt as fixed-shape, masked, batched,
pure-functional JAX programs that compile to single XLA executables and
shard over TPU meshes with pjit/shard_map. Hot ops (RoI align, NMS) have
Pallas TPU kernels alongside pure-jnp references.

Coordinate convention: like the reference, all box coordinates are
1-indexed image-space pixels, boxes are (xc, yc, w, h) unless a function
name says otherwise. See densecap_tpu/ops/boxes.py for the two IoU
conventions the reference uses.
"""

__version__ = "0.1.0"
