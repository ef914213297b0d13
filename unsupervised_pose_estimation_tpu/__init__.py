"""TPU-native framework for self- & semi-supervised monocular depth and
ego-motion (pose) estimation on endoscopy / KITTI video.

A ground-up JAX / XLA / Pallas / pjit re-design with the capabilities of
``meghakalia/unsupervised_pose_estimation`` (a monodepth2 fork; see SURVEY.md).
Functional core, NHWC layouts, whole-train-step compilation, and batch data
parallelism over a ``jax.sharding.Mesh``.

Subpackages
-----------
ops       pure-jnp + Pallas geometry, warping, and loss kernels (reference L1)
models    Flax modules: ResNet encoder, depth/pose decoders, GAN nets (ref L2)
data      host-side split parsing, decode, augment, batch, prefetch (ref L3)
parallel  mesh construction and sharding rules
train     train state, fused pjit train step, loop, checkpointing, logging
eval      depth metrics, pose ATE/RE, evaluation drivers
cli       command-line entry points mirroring the reference's flag surface
"""

__version__ = "0.1.0"
