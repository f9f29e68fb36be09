"""axial_vs_tpu: a TPU-native (JAX/XLA/Pallas/pjit) video segmentation framework.

Re-implements the capabilities of TACJu/Axial-VS (MaXTron) — kMaX-DeepLab
clip-level panoptic segmentation enriched with within-clip axial-trajectory
attention and cross-clip tracking — as one idiomatic JAX codebase:

- ``ops``        low-level numerics: norms, initializers, resize, deformable
                 attention (XLA + Pallas), Hungarian matching.
- ``layers``     neural net building blocks (ConvBN, axial attention,
                 trajectory attention, position embeddings, ASPP, kMaX layers).
- ``models``     backbones (ResNet/ConvNeXt/Swin), pixel/transformer decoders,
                 tracking modules and the meta-architectures.
- ``losses``     Hungarian matcher + PQ-style set criterion.
- ``data``       dataset registration, clip sampling, augmentation.
- ``evaluation`` VPQ / STQ / PQ / YTVIS-AP metrics.
- ``parallel``   device mesh + sharding utilities (DP/SP over ICI).
- ``engine``     trainer, optimizer rules, LR schedules, checkpointing.

Layout convention: channels-last (NHWC / NLC) everywhere; parameters fp32;
activations optionally bfloat16 with fp32 islands where the reference pins
fp32 (attention softmax logits, LayerNorm, loss computation).
"""

__version__ = "0.1.0"
